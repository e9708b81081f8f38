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
    # the reference trains with a 20-row queue of RAW logits and evaluates
    # with a 10-row queue of per-patch SOFTMAXED logits
    # (``lora_utils.py:137-151,222-240``) — both asymmetries mirrored here
    queue_size: int = 20  # train queue (ref max_queue_length=20, line 224)
    eval_queue_size: int = 10  # eval queue (ref line 137)
    eval_softmax: bool = True  # eval queues softmaxed rows (ref line 147)
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
    """Merge ``new_logits [M, C]`` into the ``queue [Q, C]``, keeping the Q
    ROWS with the largest row-max — exact ``update_sorted_queue`` semantics
    (``lora_utils.py:30-36``: items sort by ``x[1].max()`` and the list
    truncates; whole logit ROWS survive together, NOT per-class columns —
    the r4 implementation kept independent per-class top-q, a real
    behavioral divergence this rewrite closes, pinned by
    ``tests/test_reference_parity_lora.py``). Ties keep earlier arrivals,
    like the reference's stable ``list.sort`` (``lax.top_k`` breaks ties by
    lower index; the existing queue is concatenated first)."""
    stacked = jnp.concatenate([queue, new_logits], axis=0)  # [Q+M, C]
    keys = jnp.max(stacked, axis=1)
    _, idx = jax.lax.top_k(keys, queue.shape[0])
    return jnp.take(stacked, idx, axis=0)


def streamed_slide_logits(
    encode_fn,  # (params, mb) -> [M, C]; with_aux: (params, mb, valid) -> ([M, C], scalar)
    params: dict,
    patches: jax.Array,
    valid: jax.Array,
    cfg: LoraFinetuneConfig,
    *,
    with_aux: bool = False,
    eval_mode: bool = False,
):
    """Stream ``patches [N, ...]`` through ``encode_fn(params, mb) ->
    [M, C]`` patch logits in ``cfg.minibatch`` chunks; return the mean of
    the top-q rows by row-max (invalid patches contribute ``-inf`` rows and
    never enter the queue). With ``with_aux`` the encoder is called as
    ``encode_fn(params, mb, chunk_valid)`` and returns ``(logits, scalar)``
    per minibatch (e.g. a router balance loss computed over the valid
    patches only); this then returns ``(slide_logits, mean_aux)``.

    ``eval_mode`` applies the reference ``val_fn`` asymmetry
    (``lora_utils.py:137-151``): rows are SOFTMAXED per patch before
    queueing and the queue shrinks to ``cfg.eval_queue_size``."""
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
        if eval_mode and cfg.eval_softmax:
            logits = jax.nn.softmax(logits, axis=1)  # ref lora_utils.py:147
        logits = jnp.where(vm[:, None], logits, NEG)
        return (update_queue(queue, logits), aux, aux_w), None

    q = cfg.eval_queue_size if eval_mode else cfg.queue_size
    queue0 = jnp.full((q, cfg.n_classes), NEG, jnp.float32)
    (queue, aux, aux_w), _ = jax.lax.scan(
        body, (queue0, jnp.float32(0.0), jnp.float32(0.0)), (chunks, vchunks))
    # count-corrected mean over genuinely filled ROWS (slides with fewer
    # than q valid patches)
    filled = jnp.max(queue, axis=1) > NEG / 2  # [Q]
    count = jnp.maximum(jnp.sum(filled), 1)
    pooled = jnp.sum(jnp.where(filled[:, None], queue, 0.0), axis=0) / count
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
        # eval_mode: the reference val_fn queues softmaxed rows with the
        # smaller eval queue (lora_utils.py:137-151)
        if cfg.balance_coef > 0:
            return streamed_slide_logits(encode_fn, p, patches, valid, cfg,
                                         with_aux=True, eval_mode=True)[0]
        return streamed_slide_logits(encode_fn, p, patches, valid, cfg,
                                     eval_mode=True)

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
