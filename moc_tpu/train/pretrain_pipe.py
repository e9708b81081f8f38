"""GPipe pipeline-parallel pretraining over a ``pipe`` mesh axis.

Pipeline parallelism is absent from the reference (SURVEY.md §2.6
checklist: "PP: absent" — torchscale ships only FSDP hooks); here it is a
full TRAINING feature, not just the ``parallel.pipeline`` primitive: the
masked-token train step (same objective as ``train/pretrain.py``) with the
encoder's layer stack split into ``pipe``-many stages, microbatches
streamed through ``pipeline_apply`` (``lax.ppermute`` neighbor transfers
riding ICI), and the GPipe backward derived entirely by autodiff — the
reverse pipeline's ppermutes are the transposes of the forward's.

Gradient exactness by construction (certified in ``dryrun_multichip`` and
``tests/test_distributed_train.py``): the loss is computed on the LAST
stage and psum-broadcast (``psum(where(idx == S-1, loss, 0))``), and
``pipeline_apply`` ingests microbatches only on stage 0 (its ``where``
gate), so each rank's backward contributes exactly its own compute path
and the replicated-param cotangent psum sums to the single-device
gradient — no factor-of-S corrections anywhere (verified empirically:
shard_map transposes this pattern exactly).

Composes with data parallelism: a ``data × pipe`` mesh shards batch rows
over ``data`` while each data-shard's pipe group runs its own pipeline;
the loss psum over both axes is the global masked-token mean.

Scope: homogeneous dense layer stacks (the restacking [L] → [S, L/S]
requires every layer to share one param structure). MoE (``moe_freq``),
multiway, and relative-position-bias encoders are rejected loudly —
shard experts over the ``expert`` axis instead (``train/pretrain.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moc_tpu.nn.encoder import EncoderLayer, MultiwayLayerNorm
from moc_tpu.parallel.pipeline import pipeline_apply
from moc_tpu.train.pretrain import MaskedTokenModel, PretrainConfig

AXIS_PIPE = "pipe"


def check_pipe_compatible(cfg: PretrainConfig, n_stages: int) -> None:
    e = cfg.encoder
    if e.moe_freq:
        raise ValueError(
            "pipeline parallelism needs a homogeneous layer stack; MoE "
            "layers differ structurally — shard experts over the 'expert' "
            "axis instead (train/pretrain.py)")
    if e.multiway:
        raise ValueError("pipeline parallelism does not support multiway "
                         "(per-modality) stacks")
    if e.rel_pos_buckets > 0 and e.max_rel_pos > 0:
        raise ValueError("pipeline parallelism does not plumb the shared "
                         "relative-position bias across stages")
    if e.layers % n_stages:
        raise ValueError(f"--layers {e.layers} must divide into "
                         f"{n_stages} pipeline stages")


def split_pipe_params(params, n_stages: int):
    """Full ``MaskedTokenModel`` param tree → ``(stages, shared)``.

    ``stages``: the per-layer trees stacked to ``[S, L/S, ...]`` leaves
    (leading axis shards over ``pipe``). ``shared``: embed/pos/final-LN/
    lm_head, replicated."""
    p = params["params"]
    enc = p["encoder"]
    layer_keys = sorted((k for k in enc if k.startswith("layers_")),
                        key=lambda k: int(k.split("_")[1]))
    n_layers = len(layer_keys)
    lps = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[enc[k] for k in layer_keys])
    stages = jax.tree.map(
        lambda x: x.reshape((n_stages, lps) + x.shape[1:]), stacked)
    shared = {"embed": p["embed"], "pos": p["pos"],
              "layer_norm": enc.get("layer_norm"), "lm_head": p["lm_head"]}
    return stages, shared


def merge_pipe_params(stages, shared):
    """Inverse of ``split_pipe_params`` — rebuild the plain model tree (for
    checkpoint interop with the non-pipelined trainer and parity tests)."""
    leaves = jax.tree_util.tree_leaves(stages)
    s, lps = leaves[0].shape[0], leaves[0].shape[1]
    enc = {}
    for i in range(s * lps):
        enc[f"layers_{i}"] = jax.tree.map(
            lambda x: x[i // lps, i % lps], stages)
    if shared.get("layer_norm") is not None:
        enc["layer_norm"] = shared["layer_norm"]
    return {"params": {"embed": shared["embed"], "pos": shared["pos"],
                       "encoder": enc, "lm_head": shared["lm_head"]}}


def make_pipe_state(cfg: PretrainConfig, mesh: Mesh, seed: int = 0):
    """Init pipeline-sharded train state on ``mesh`` (must carry a ``pipe``
    axis; optional ``data``). Returns ``(params, optimizer, opt_state,
    shardings)`` with ``params = {"stages": ..., "shared": ...}``."""
    n_stages = mesh.shape[AXIS_PIPE]
    check_pipe_compatible(cfg, n_stages)
    model = MaskedTokenModel(cfg)
    full = model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, cfg.max_len), jnp.int32))
    stages, shared = split_pipe_params(full, n_stages)
    stage_ns = NamedSharding(mesh, P(AXIS_PIPE))
    repl = NamedSharding(mesh, P())
    shardings = {"stages": jax.tree.map(lambda _: stage_ns, stages),
                 "shared": jax.tree.map(lambda _: repl, shared)}
    params = {"stages": jax.tree.map(lambda x: jax.device_put(x, stage_ns),
                                     stages),
              "shared": jax.tree.map(lambda x: jax.device_put(x, repl),
                                     shared)}
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    return params, optimizer, opt_state, shardings


def make_pipe_train_step(cfg: PretrainConfig, mesh: Mesh, optimizer,
                         shardings, *, num_microbatches: int):
    """Jitted GPipe train step: ``(params, opt_state, ids [B, L],
    mask [B, L]) -> (params, opt_state, loss)``."""
    n_stages = mesh.shape[AXIS_PIPE]
    check_pipe_compatible(cfg, n_stages)
    has_data = "data" in mesh.axis_names and mesh.shape["data"] > 1
    psum_axes = (("data", AXIS_PIPE) if has_data else (AXIS_PIPE,))
    enc = cfg.encoder
    layer = EncoderLayer(enc, False)
    final_ln = MultiwayLayerNorm(enc.layernorm_eps)

    def local_loss(stages_local, shared, ids, mask_pos):
        # inside shard_map: ids/mask are this data-shard's rows, replicated
        # across the pipe group; stages_local is [1, L/S, ...]
        idx = jax.lax.axis_index(AXIS_PIPE)
        masked_ids = jnp.where(mask_pos, cfg.vocab_size - 1, ids)
        emb = jnp.take(shared["embed"]["embedding"], masked_ids, axis=0)
        x = emb + shared["pos"][: ids.shape[1]]
        bl = x.shape[0]
        if bl % num_microbatches:
            raise ValueError(f"local batch {bl} not divisible by "
                             f"{num_microbatches} microbatches")
        mb = x.reshape((num_microbatches, bl // num_microbatches)
                       + x.shape[1:])
        my_stage = jax.tree.map(lambda t: t[0], stages_local)

        def stage_fn(sp, h):
            def body(h, lp):
                h2, _ = layer.apply({"params": lp}, h)
                return h2, None
            h, _ = jax.lax.scan(body, h, sp)
            return h

        outs = pipeline_apply(stage_fn, my_stage, mb, AXIS_PIPE, n_stages,
                              gather_output=False)
        h = outs.reshape((bl,) + outs.shape[2:])
        # final LN + LM head: real output lives on the last stage only
        # (zeros elsewhere — their loss is gated out below)
        if shared.get("layer_norm") is not None:
            h = final_ln.apply({"params": shared["layer_norm"]}, h, None)
        logits = (h @ shared["lm_head"]["kernel"]
                  + shared["lm_head"]["bias"]).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ids)
        w = mask_pos.astype(jnp.float32)
        last = (idx == n_stages - 1).astype(jnp.float32)
        num = jax.lax.psum(last * jnp.sum(ce * w), psum_axes)
        den = jax.lax.psum(last * jnp.sum(w), psum_axes)
        return num / jnp.maximum(den, 1.0)

    data_p = P("data" if has_data else None, None)
    sharded_loss = shard_map(
        local_loss, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(AXIS_PIPE),
                               shardings["stages"]),
                  jax.tree.map(lambda _: P(), shardings["shared"]),
                  data_p, data_p),
        out_specs=P(), check_vma=False)

    def loss_fn(params, ids, mask_pos):
        return sharded_loss(params["stages"], params["shared"], ids,
                            mask_pos)

    def step(params, opt_state, ids, mask_pos):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids, mask_pos)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data_ns = NamedSharding(mesh, data_p)
    repl = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(shardings, None, data_ns, data_ns),
                   out_shardings=(shardings, None, repl),
                   donate_argnums=(0, 1))


def run_pipe_pretrain(
    cfg: PretrainConfig,
    mesh: Mesh,
    data_fn,
    *,
    total_steps: int,
    num_microbatches: int = 4,
    ckpt_dir: str | None = None,
    ckpt_every: int = 1000,
    seed: int = 0,
    log=None,
):
    """Pipeline-parallel analogue of ``run_pretrain`` (same data_fn contract,
    same orbax checkpoint/resume semantics)."""
    params, optimizer, opt_state, shardings = make_pipe_state(cfg, mesh, seed)
    start = 0
    if ckpt_dir is not None:
        from moc_tpu.utils.checkpoint import latest_step, restore_checkpoint

        last = latest_step(ckpt_dir)
        if last is not None:
            tree = restore_checkpoint(
                ckpt_dir, {"params": jax.device_get(params),
                           "opt_state": jax.device_get(opt_state)},
                step=last)
            params = jax.tree.map(jax.device_put, tree["params"], shardings)

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
    step_fn = make_pipe_train_step(cfg, mesh, optimizer, shardings,
                                   num_microbatches=num_microbatches)
    losses = []
    for i in range(start, total_steps):
        token_ids, mask_pos = data_fn(i)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(token_ids),
            jnp.asarray(mask_pos))
        losses.append(float(loss))
        if log:
            log(f"step {i}: loss={losses[-1]:.4f}")
        if ckpt_dir is not None and ((i + 1) % ckpt_every == 0
                                     or i + 1 == total_steps):
            from moc_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, i + 1,
                            {"params": params, "opt_state": opt_state})
    return params, opt_state, losses
