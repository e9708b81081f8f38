"""CONCH-LoRA fine-tuning on raw patch bags with streamed top-k pooling.

Behavioral reference ``/root/reference/utils/lora_utils.py:38-277``: patches
stream through the (LoRA-adapted) vision tower in minibatches; a sorted
queue keeps the top-q per-class patch logits seen so far (``update_sorted_
queue``, 30-36) and the slide logits are the queue mean — a
differentiable-through-selection top-k pooling that bounds memory at
``queue_size`` activations; CE on the pooled logits, best-val-AUC model
selection. (The reference's AMP path is intentionally disabled there —
"fp16 seems give worse results" — we train f32/bf16 as configured.)

TPU-native: the patch stream is a ``lax.scan`` over fixed-size minibatches
of a padded bag, with the queue as carry; gradients flow into the selected
patches' forward passes via the scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moc_tpu.models.lora import lora_optimizer

NEG = -1e30


@dataclasses.dataclass(frozen=True)
class LoraFinetuneConfig:
    queue_size: int = 10  # ref: 10 (binary) / 20
    minibatch: int = 8  # patches per tower forward (ref minibatch-8 streaming)
    learning_rate: float = 1e-4
    n_classes: int = 2
    # > 0: MoE-LoRA mode — ``encode_fn`` is called as ``encode_fn(params,
    # mb, chunk_valid)`` and must return ``(logits, balance)`` per minibatch
    # (e.g. ``models.lora.lora_balance_loss(inter, patch_valid=chunk_valid)``
    # over sown router gates, so padding patches inside partial chunks never
    # steer the router); the train loss becomes CE + coef × mean-balance.
    balance_coef: float = 0.0


def update_queue(queue: jax.Array, new_logits: jax.Array) -> jax.Array:
    """Merge ``new_logits [M, C]`` into the per-class top-q ``queue [Q, C]``
    (ref ``update_sorted_queue``): keep the q largest per class."""
    stacked = jnp.concatenate([queue, new_logits], axis=0)
    vals, _ = jax.lax.top_k(stacked.T, queue.shape[0])  # [C, Q]
    return vals.T


def streamed_slide_logits(
    encode_fn,  # (params, mb) -> [M, C]; with_aux: (params, mb, valid) -> ([M, C], scalar)
    params: dict,
    patches: jax.Array,
    valid: jax.Array,
    cfg: LoraFinetuneConfig,
    *,
    with_aux: bool = False,
):
    """Stream ``patches [N, ...]`` through ``encode_fn(params, mb) ->
    [M, C]`` patch logits in ``cfg.minibatch`` chunks; return the top-q mean
    slide logits ``[C]`` (invalid patches contribute ``-inf`` and never enter
    the queue). With ``with_aux`` the encoder is called as
    ``encode_fn(params, mb, chunk_valid)`` and returns ``(logits, scalar)``
    per minibatch (e.g. a router balance loss computed over the valid
    patches only); this then returns ``(slide_logits, mean_aux)``."""
    n = patches.shape[0]
    m = cfg.minibatch
    assert n % m == 0, f"pad the bag to a multiple of {m}"
    chunks = patches.reshape(n // m, m, *patches.shape[1:])
    vchunks = valid.reshape(n // m, m)

    def body(carry, inp):
        queue, aux, aux_w = carry
        mb, vm = inp
        if with_aux:
            # aux encoders take the chunk validity so the router balance
            # loss is computed over REAL patches only (the encoder masks
            # gate rows; lora_balance_loss(patch_valid=...)); the chunk
            # losses combine weighted by valid fraction — fully-padded
            # filler chunks contribute zero
            logits, a = encode_fn(params, mb, vm)
            frac = jnp.sum(vm.astype(jnp.float32)) / vm.shape[0]
            aux = aux + frac * a
            aux_w = aux_w + frac
        else:
            logits = encode_fn(params, mb)  # [M, C]
        logits = jnp.where(vm[:, None], logits, NEG)
        return (update_queue(queue, logits), aux, aux_w), None

    queue0 = jnp.full((cfg.queue_size, cfg.n_classes), NEG, jnp.float32)
    (queue, aux, aux_w), _ = jax.lax.scan(
        body, (queue0, jnp.float32(0.0), jnp.float32(0.0)), (chunks, vchunks))
    # count-corrected mean over genuinely filled slots
    filled = queue > NEG / 2
    count = jnp.maximum(jnp.sum(filled[:, 0]), 1)
    pooled = jnp.sum(jnp.where(filled, queue, 0.0), axis=0) / count
    if with_aux:
        return pooled, aux / jnp.maximum(aux_w, 1e-6)
    return pooled


def make_lora_train_step(encode_fn, cfg: LoraFinetuneConfig, params,
                         extra_trainable=("head",)):
    """Jitted per-slide train step updating only LoRA (+head) params.

    Deliberately CONSTANT learning rate: the reference constructs
    ``CosineAnnealingLR(optimizer, 20)`` but never calls ``scheduler.step()``
    anywhere in the LoRA loop (``lora_utils.py:112`` is its only mention),
    so its effective LR is constant too."""
    opt = lora_optimizer(optax.adam(cfg.learning_rate), params, extra_trainable)

    def loss_fn(p, patches, valid, label):
        if cfg.balance_coef > 0:
            logits, bal = streamed_slide_logits(encode_fn, p, patches, valid,
                                                cfg, with_aux=True)
        else:
            logits = streamed_slide_logits(encode_fn, p, patches, valid, cfg)
            bal = 0.0
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[None], label[None]
        )[0]
        return ce + cfg.balance_coef * bal, logits

    @jax.jit
    def step(p, opt_state, patches, valid, label):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, patches, valid, label
        )
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss, logits

    return step, opt


def run_lora_finetune(
    encode_fn,
    params,
    slides: list,
    val_slides: list,
    cfg: LoraFinetuneConfig,
    *,
    epochs: int = 5,
    log=None,
):
    """Small driver: per-slide steps, best-val-AUC param selection
    (ref ``lora_utils.py:265-272``). ``slides`` = list of
    ``(patches, valid, label)`` host arrays."""
    from moc_tpu.metrics import roc_auc_host, softmax_probs

    step, opt = make_lora_train_step(encode_fn, cfg, params)
    opt_state = opt.init(params)

    @jax.jit
    def infer(p, patches, valid):
        if cfg.balance_coef > 0:
            return streamed_slide_logits(encode_fn, p, patches, valid, cfg,
                                         with_aux=True)[0]
        return streamed_slide_logits(encode_fn, p, patches, valid, cfg)

    def val_auc(p):
        logits = np.stack([np.asarray(infer(p, x, v)) for x, v, _ in val_slides])
        labels = np.asarray([y for _, _, y in val_slides])
        probs = np.asarray(softmax_probs(jnp.asarray(logits), 1.0))
        return roc_auc_host(probs, labels)

    best = (-1.0, jax.device_get(params))
    for epoch in range(epochs):
        for patches, valid, label in slides:
            params, opt_state, loss, _ = step(
                params, opt_state, jnp.asarray(patches), jnp.asarray(valid),
                jnp.asarray(label),
            )
        auc = val_auc(params)
        if log:
            log(f"epoch {epoch}: val auc={auc:.4f}")
        if auc > best[0]:
            best = (auc, jax.device_get(params))
    return best[1], best[0]
