"""Distributed foundation-encoder training: dp/sp/tp/ep on one mesh (GSPMD).

This is the training-scale path the reference only reaches latently through
the vendored torchscale stack (FSDP hooks, NCCL collectives — SURVEY.md
§2.6): a masked-token-prediction train step over the MUSK-class encoder,
partitioned the XLA-idiomatic way — annotate shardings, let GSPMD insert the
collectives (scaling-book recipe):

  * ``data``   axis: batch dimension of the token stream (DP);
  * ``seq``    axis: sequence dimension (SP — activations sharded; attention
    resharding/all-gathers inserted by XLA);
  * ``tensor`` axis: FFN hidden + attention head projections (TP — matmul
    partial sums reduced by XLA);
  * ``expert`` axis: the stacked MoE expert parameters (EP — the
    dispatch/combine einsums lower to all_to_all).

Gradients, optimizer states, and backward collectives all follow from the
same annotations via autodiff — no hand-written collective layer (the
reference needed custom autograd Functions for each primitive,
``component/utils.py:37-70``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moc_tpu.nn.encoder import Encoder, EncoderConfig
from moc_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT, AXIS_SEQ, AXIS_TENSOR
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    vocab_size: int = 1024
    max_len: int = 512
    mask_prob: float = 0.15
    encoder: EncoderConfig = EncoderConfig(embed_dim=256, ffn_dim=1024,
                                           layers=4, heads=8)
    learning_rate: float = 1e-3
    moe_aux_weight: float = 0.01
    # bf16-parameter training recipe: "bfloat16" stores every ≥2-D param
    # (matmul kernels, embeddings, stacked experts) in bf16 — the fwd/bwd
    # weight reads halve in HBM bytes — while an f32 MASTER copy lives in
    # the optimizer state and Adam runs in f32 on upcast grads; each step
    # re-casts params from the updated master (no drift accumulation in
    # bf16). 1-D leaves (biases, LN/RMS scales) stay f32 so norm statistics
    # keep full precision. bf16 shares f32's exponent range, so no loss
    # scaling is needed (unlike fp16). Memory: 14 B/param (2 store + 4
    # master + 8 moments) vs 12 B/param f32 — a deliberate speed-for-memory
    # trade; combine with remat if HBM-bound. Usually paired with
    # encoder.compute_dtype="bfloat16".
    param_dtype: str | None = None


class MaskedTokenModel(nn.Module):
    """Token embedding + encoder + tied-ish LM head (masked-token task)."""

    cfg: PretrainConfig

    @nn.compact
    def __call__(self, token_ids, padding_mask=None):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.encoder.embed_dim, name="embed")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (c.max_len, c.encoder.embed_dim))
        x = x + pos[: x.shape[1]]
        x, aux = Encoder(c.encoder, name="encoder")(x, padding_mask)
        # CE over the vocab needs f32 logits even under bf16 compute
        # (softmax of 8k-way bf16 logits loses mask-token signal)
        logits = nn.Dense(c.vocab_size, name="lm_head")(
            x).astype(jnp.float32)
        return logits, aux


def _spec_for(path_names: list[str], shape: tuple[int, ...], mesh: Mesh) -> P:
    """Sharding rule: path+shape → PartitionSpec (replicate by default)."""
    has = lambda a: a in mesh.axis_names and mesh.shape[a] > 1
    name = path_names[-1] if path_names else ""
    joined = "/".join(path_names)

    def p(*axes):
        return P(*[a if (a and has(a)) else None for a in axes])

    # MoE experts [E, ...]: experts over `expert`, hidden dim over `tensor`
    if name == "experts_w1":
        return p(AXIS_EXPERT, None, AXIS_TENSOR)
    if name == "experts_b1":
        return p(AXIS_EXPERT, AXIS_TENSOR)
    if name == "experts_w2":
        return p(AXIS_EXPERT, AXIS_TENSOR, None)
    if name == "experts_b2":
        return p(AXIS_EXPERT, None)
    # FFN: column-split fc1, row-split fc2 (megatron layout)
    if "fc1" in joined and name == "kernel":
        return p(None, AXIS_TENSOR)
    if "fc1" in joined and name == "bias":
        return p(AXIS_TENSOR)
    if "ffn_layernorm" in joined:
        return p(AXIS_TENSOR)
    if "fc2" in joined and name == "kernel":
        return p(AXIS_TENSOR, None)
    # attention projections: heads over `tensor`
    if name == "kernel" and any(k in joined for k in ("q_proj", "k_proj", "v_proj")):
        return p(None, AXIS_TENSOR)
    if name == "bias" and any(k in joined for k in ("q_proj", "k_proj", "v_proj")):
        return p(AXIS_TENSOR)
    if "out_proj" in joined and name == "kernel":
        return p(AXIS_TENSOR, None)
    # big embeddings: shard vocab over data axis (ZeRO-ish memory relief)
    if name == "embedding" and shape[0] >= 1024:
        return p(AXIS_DATA, None)
    return P()


def encoder_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for the model params under the rule set above."""

    def walk(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        return NamedSharding(mesh, _spec_for(names, jnp.shape(leaf), mesh))

    return jax.tree_util.tree_map_with_path(walk, params)


def cast_params_for_storage(params: Any, param_dtype: str | None):
    """Apply the ``PretrainConfig.param_dtype`` storage rule: ≥2-D leaves
    cast to the storage dtype, 1-D scales/biases stay f32 (norm stats keep
    full precision)."""
    if param_dtype is None:
        return params
    dt = jnp.dtype(param_dtype)
    # uncast leaves are COPIED, not shared: the storage tree and the f32
    # master both ride through a donating jitted step, and a shared buffer
    # would be donated twice (XLA rejects that)
    return jax.tree.map(
        lambda x: x.astype(dt) if jnp.ndim(x) >= 2 else jnp.array(x), params)


def make_pretrain_state(cfg: PretrainConfig, mesh: Mesh, seed: int = 0):
    """Init (model, params, opt_state) with params placed per the sharding
    rules (optimizer state inherits the param shardings).

    With ``cfg.param_dtype`` set, ``params`` are the bf16 storage copy and
    ``opt_state = (adam_state, master_f32)`` — the f32 master tree rides in
    the optimizer state (both placed with the same shardings)."""
    model = MaskedTokenModel(cfg)
    ids = jnp.zeros((1, cfg.max_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids)
    shardings = encoder_param_shardings(params, mesh)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    optimizer = optax.adam(cfg.learning_rate)
    if cfg.param_dtype is not None:
        master = params  # f32 source of truth
        params = cast_params_for_storage(params, cfg.param_dtype)
        opt_state = (optimizer.init(master), master)
    else:
        opt_state = optimizer.init(params)
    return model, params, optimizer, opt_state, shardings


def pretrain_data_spec(mesh: Mesh) -> P:
    """PartitionSpec of a ``[B, L]`` pretrain batch on ``mesh``: batch over
    ``data``, sequence over ``seq`` (axes of size 1 stay unsharded). THE
    single definition — the jitted step's in_shardings and the multi-process
    CLI's host-shard assembly (``cli.pretrain``) must agree on it."""
    return P(AXIS_DATA if mesh.shape.get(AXIS_DATA, 1) > 1 else None,
             AXIS_SEQ if mesh.shape.get(AXIS_SEQ, 1) > 1 else None)


def make_sharded_train_step(cfg: PretrainConfig, mesh: Mesh, model, optimizer,
                            param_shardings):
    """Jitted masked-token train step with dp/sp input sharding and
    tp/ep parameter sharding. ``batch = (token_ids [B, L], mask_pos [B, L])``."""
    data_spec = NamedSharding(mesh, pretrain_data_spec(mesh))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, token_ids, mask_pos):
        masked_ids = jnp.where(mask_pos, cfg.vocab_size - 1, token_ids)  # [MASK]
        logits, aux = model.apply(params, masked_ids)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, token_ids)
        w = mask_pos.astype(jnp.float32)
        loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss + cfg.moe_aux_weight * aux, (loss, aux)

    def step(params, opt_state, token_ids, mask_pos):
        grads, (loss, aux) = jax.grad(loss_fn, has_aux=True)(
            params, token_ids, mask_pos
        )
        if cfg.param_dtype is not None:
            # f32-master recipe: Adam updates the master in f32 on upcast
            # grads; the bf16 storage copy is re-cast FROM the master each
            # step (round-to-nearest of the f32 truth — no bf16 drift).
            adam_state, master = opt_state
            g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, adam_state = optimizer.update(g32, adam_state, master)
            master = optax.apply_updates(master, updates)
            params = jax.tree.map(lambda m, p: m.astype(p.dtype), master,
                                  params)
            return params, (adam_state, master), loss, aux
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(
        step,
        in_shardings=(param_shardings, None, data_spec, data_spec),
        out_shardings=(param_shardings, None, repl, repl),
        donate_argnums=(0, 1),
    )


def clip_contrastive_loss(image_emb, text_emb, logit_scale, axis_name=None):
    """Symmetric InfoNCE over L2-normalized embeddings (the MUSK/CoCa
    contrastive objective behind the reference's ``logit_scale``,
    ``musk/modeling.py:96-175``).

    With ``axis_name`` (inside shard_map over a data axis), negatives are
    gathered across devices so the full global batch contrasts.
    """
    if axis_name is not None:
        all_text = jax.lax.all_gather(text_emb, axis_name, tiled=True)
        all_image = jax.lax.all_gather(image_emb, axis_name, tiled=True)
        base = jax.lax.axis_index(axis_name) * image_emb.shape[0]
    else:
        all_text, all_image = text_emb, image_emb
        base = 0
    logits_i = (image_emb @ all_text.T) * logit_scale  # [b, B_global]
    logits_t = (text_emb @ all_image.T) * logit_scale
    labels = base + jnp.arange(image_emb.shape[0])
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits_i, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits_t, labels)
    return 0.5 * (jnp.mean(loss_i) + jnp.mean(loss_t))


def make_musk_contrastive_step(model, optimizer, *, aux_weight: float = 0.01):
    """Jitted image-text contrastive train step for the MUSK dual tower."""

    def loss_fn(params, images, token_ids, pad_mask):
        v, t, scale = model.apply(params, images, token_ids,
                                  text_padding_mask=pad_mask)
        return clip_contrastive_loss(v, t, scale)

    @jax.jit
    def step(params, opt_state, images, token_ids, pad_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, token_ids, pad_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def run_pretrain(
    cfg: PretrainConfig,
    mesh: Mesh,
    data_fn,
    *,
    total_steps: int,
    ckpt_dir: str | None = None,
    ckpt_every: int = 1000,
    seed: int = 0,
    log=None,
):
    """Preemption-safe pretrain driver over the sharded step.

    The reference has no resume at all (SURVEY §5.3: crashes kill the
    process); here training checkpoints ``{params, opt_state}`` to an orbax
    directory every ``ckpt_every`` steps and re-invocation restarts from the
    latest step. ``data_fn(step) -> (token_ids [B, L], mask_pos [B, L])``
    must be a deterministic function of the step index so a resumed run
    replays the exact same batch sequence.

    Returns ``(params, opt_state, losses)`` with ``losses`` covering only
    the steps executed in THIS invocation.
    """
    model, params, optimizer, opt_state, shardings = make_pretrain_state(
        cfg, mesh, seed)
    start = 0
    if ckpt_dir is not None:
        from moc_tpu.utils.checkpoint import latest_step, restore_checkpoint

        last = latest_step(ckpt_dir)
        if last is not None and jax.process_count() > 1:
            # multi-process: restore straight onto the live sharded arrays
            # (orbax reads each host's shards; no host round-trip exists that
            # could even hold a cross-process-sharded leaf). Single-device
            # leaves (the optimizer's scalar step count, created eagerly
            # outside pjit) come back COMMITTED to device 0, which conflicts
            # with mesh-placed arguments at the first jitted step — strip
            # them back to uncommitted host-backed arrays, same rule as the
            # single-process `_replace` below.
            tree = restore_checkpoint(
                ckpt_dir, {"params": params, "opt_state": opt_state},
                step=last)

            def _uncommit(fresh, restored):
                if isinstance(fresh.sharding,
                              jax.sharding.SingleDeviceSharding):
                    return jnp.asarray(jax.device_get(restored))
                return restored

            params = tree["params"]
            opt_state = jax.tree.map(_uncommit, opt_state,
                                     tree["opt_state"])
            start = last
            if log:
                log(f"resumed from step {last}")
        elif last is not None:
            tree = restore_checkpoint(
                ckpt_dir, {"params": jax.device_get(params),
                           "opt_state": jax.device_get(opt_state)}, step=last)
            params = jax.tree.map(jax.device_put, tree["params"], shardings)
            # re-place the optimizer moments with the shardings optimizer.init
            # gave the fresh state — a plain asarray would materialize them
            # replicated/unsharded, OOMing models sized to the sharded budget.
            # Leaves whose fresh sharding is single-device (e.g. the scalar
            # step count, created eagerly outside pjit) stay UNCOMMITTED via
            # asarray: committing them to device 0 conflicts with
            # mesh-placed arguments at the first jitted step.
            def _replace(fresh, restored):
                if (hasattr(fresh, "sharding")
                        and not isinstance(fresh.sharding,
                                           jax.sharding.SingleDeviceSharding)):
                    return jax.device_put(restored, fresh.sharding)
                return jnp.asarray(restored)

            opt_state = jax.tree.map(_replace, opt_state, tree["opt_state"])
            start = last
            if log:
                log(f"resumed from step {last}")

    step_fn = make_sharded_train_step(cfg, mesh, model, optimizer, shardings)
    losses = []
    for i in range(start, total_steps):
        token_ids, mask_pos = data_fn(i)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, jnp.asarray(token_ids), jnp.asarray(mask_pos))
        losses.append(float(loss))
        if log:
            log(f"step {i}: loss={losses[-1]:.4f} aux={float(aux):.4f}")
        if ckpt_dir is not None and ((i + 1) % ckpt_every == 0
                                     or i + 1 == total_steps):
            from moc_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, i + 1,
                            {"params": params, "opt_state": opt_state})
    return params, opt_state, losses
