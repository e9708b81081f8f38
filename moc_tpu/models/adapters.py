"""Few-shot adapter zoo over frozen CONCH embeddings.

Behavioral reference ``/root/reference/models/model_adapters.py``:
  * ``ClipAdapter``   — bottleneck MLP residual blended at ``clip_ratio``
    with the raw embedding, renormalized, scored against the zero-shot
    classifier, top-j mean pooled (``Conch_CLIP_Ada``, 148-215);
  * ``TipAdapter``    — cache-model linear head (optionally initialized from
    few-shot class means) blended with zero-shot logits
    (``Linear_Adapter`` 77-97 + ``Conch_TIP_Ada`` 218-250);
  * ``MoEClipAdapter``— N bottleneck experts mixed by a (optionally top-1
    "switch") softmax router with the Switch-Transformer load-balancing
    loss (``SwitchGate`` 292-327, ``Conch_MOE_CLIP_Ada`` 330-405);
  * ``AMUAdapter``    — dual-backbone: CONCH logits + an auxiliary-feature
    linear adapter weighted by an uncertainty measure of the CONCH logits
    (8 variants, ``uncertainty`` 100-145; ``Conch_AMUVanilla_Ada`` 408-497).

All operate on padded ``[N, D]`` patch-embedding bags with validity masks;
pooling is the shared masked top-j mean (``moc_tpu.ops.topj_pooling``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from moc_tpu import ops


from moc_tpu.models.layers import l2norm as _l2norm  # noqa: E402  (shared def)


def _kaiming_a5(key, shape, dtype=jnp.float32):
    # torch kaiming_normal_(a=sqrt(5)): gain = sqrt(2/(1+5)) = 1/sqrt(3)
    fan_in = shape[0]
    std = (1.0 / np.sqrt(3.0)) / np.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


def uncertainty(logits: jax.Array, kind: str, power: float) -> jax.Array:
    """Per-patch confidence weighting of the auxiliary branch
    (ref ``uncertainty``, ``model_adapters.py:100-145``)."""
    p = jax.nn.softmax(logits, axis=-1)
    if kind == "entropy":
        ent = -jnp.sum(p * jnp.log2(p.clip(1e-12)), axis=-1, keepdims=True)
        ent = ent / jnp.log2(float(p.shape[-1]))
        return jnp.exp(ent * power)
    if kind == "energy":
        mx = jnp.max(p, axis=-1, keepdims=True)
        tau = 2.0
        energy = tau * (jnp.log(jnp.sum(jnp.exp((p - mx) / tau), axis=-1, keepdims=True)) + mx)
        return 1.0 / (energy ** power)
    if kind == "max":
        return 1.0 / jnp.max(p, axis=-1, keepdims=True) ** power
    if kind == "max-min":
        diff = jnp.max(p, axis=-1, keepdims=True) - jnp.min(p, axis=-1, keepdims=True)
        return 1.0 / diff.clip(1e-12) ** power
    if kind == "var":
        # torch.std is Bessel-corrected (ddof=1)
        return jnp.std(p, axis=-1, keepdims=True, ddof=1)
    if kind == "top5":
        k = min(5, p.shape[-1])
        top = jax.lax.top_k(p, k)[0]
        return 1.0 / (top[..., 0] - top[..., k - 1])[..., None].clip(1e-12) ** power
    if kind == "moment":
        mu = jnp.mean(p, axis=-1, keepdims=True)
        sigma = jnp.std(p, axis=-1, keepdims=True, ddof=1).clip(1e-12)
        m4 = jnp.mean(((p - mu) / sigma) ** 4, axis=-1, keepdims=True)
        return 1.0 / ((m4 / 250.0) ** power)
    if kind == "none":
        return jnp.ones(logits.shape[:-1] + (1,), logits.dtype)
    raise ValueError(f"invalid uncertainty type {kind!r}")


def linear_adapter_init(features: np.ndarray, labels: np.ndarray, n_classes: int,
                        feat_dim: int) -> np.ndarray:
    """Cache-model weight init from few-shot samples: standardized per-class
    feature means (ref ``Linear_Adapter`` init, ``model_adapters.py:82-91``).
    Returns ``[feat_dim, n_classes]``."""
    f = np.asarray(features, np.float32)
    f = (f - f.mean()) / f.std(ddof=1)  # torch.std default is ddof=1
    w = np.zeros((feat_dim, n_classes), np.float32)
    for feat, lab in zip(f, np.asarray(labels)):
        w[:, int(lab)] += feat
    w /= len(labels) / n_classes
    return w


def gt_mask_keep(coords: np.ndarray, wsi_dims: tuple[int, int],
                 mask: np.ndarray, patch_size: int = 224) -> np.ndarray:
    """Boolean keep flags: a patch survives when its ``patch_size`` window
    overlaps the tumor ground-truth bitmap.

    OpenSlide-free restatement of the Camelyon GT filter
    (ref ``init_adapter_weight_c16wGT``, ``model_adapters.py:29-75``):
    ``mask [W', H']`` is a downscaled binary tumor bitmap indexed ``[x, y]``
    (nonzero = tumor); patch coords are level-0 pixels scaled into it.
    """
    coords = np.asarray(coords)
    w0, h0 = wsi_dims
    mw, mh = mask.shape
    keep = np.zeros(len(coords), bool)
    for i, (x, y) in enumerate(coords):
        x1 = int(x / w0 * mw)
        x2 = int((x + patch_size) / w0 * mw)
        y1 = int(y / h0 * mh)
        y2 = int((y + patch_size) / h0 * mh)
        keep[i] = np.asarray(mask)[x1:x2, y1:y2].sum() > 0
    return keep


def fewshot_aux_features(slide_feats, slide_labels, keeps=None):
    """AMU auxiliary-feature init from few-shot slides (ref
    ``init_adapter_weight``/``_c16wGT``, ``model_adapters.py:12-75``):
    per-slide keep-filter (GT mask; ``None`` keeps all, as the reference does
    for normal slides), per-row mean-centering + L2, then a global mean over
    every kept patch, L2-normalized. Returns ``(aux_feature [D], labels)``.
    """
    kept = []
    for i, feats in enumerate(slide_feats):
        f = np.asarray(feats, np.float32)
        if keeps is not None and keeps[i] is not None:
            f = f[np.asarray(keeps[i])]
        f = f - f.mean(axis=-1, keepdims=True)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True).clip(1e-12)
        kept.append(f)
    aux = np.concatenate(kept, axis=0).mean(axis=0)
    aux = aux / max(np.linalg.norm(aux), 1e-12)
    return aux, np.asarray(slide_labels)


class Bottleneck(nn.Module):
    """c_in → c_in/r → c_in, bias-free, double ReLU (ref adapter MLP)."""

    c_in: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.c_in // self.reduction, use_bias=False,
                             kernel_init=_kaiming_a5, name="down")(x))
        return nn.relu(nn.Dense(self.c_in, use_bias=False,
                                kernel_init=_kaiming_a5, name="up")(h))


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    c_in: int = 512
    n_classes: int = 2
    reduction: int = 4
    clip_ratio: float = 0.1
    topj: int = 10


class ClipAdapter(nn.Module):
    cfg: AdapterConfig = AdapterConfig()

    @nn.compact
    def __call__(self, feats, valid, classifier):
        cfg = self.cfg
        adapted = Bottleneck(cfg.c_in, cfg.reduction, name="adapter")(feats)
        mixed = adapted * cfg.clip_ratio + feats * (1 - cfg.clip_ratio)
        logits = _l2norm(mixed) @ classifier  # [N, C]
        return ops.topj_pooling(logits, valid, cfg.topj)


class TipAdapter(nn.Module):
    cfg: AdapterConfig = AdapterConfig()
    cache_init: tuple | None = None  # [c_in, C] from linear_adapter_init

    @nn.compact
    def __call__(self, feats, valid, classifier):
        cfg = self.cfg
        if self.cache_init is not None:
            init = lambda *_: jnp.asarray(np.asarray(self.cache_init), jnp.float32)
        else:
            init = _kaiming_a5
        w = self.param("cache_kernel", init, (cfg.c_in, cfg.n_classes))
        f = _l2norm(feats)
        logits = (f @ w) * cfg.clip_ratio + (f @ classifier) * (1 - cfg.clip_ratio)
        return ops.topj_pooling(logits, valid, cfg.topj)


def load_balancing_loss(router_probs: jax.Array, expert_idx: jax.Array,
                        valid: jax.Array) -> jax.Array:
    """Switch-Transformer aux loss (eqs. 4-6): num_experts × ⟨frac tokens⟩ ·
    ⟨frac probability⟩ summed over experts, over valid tokens."""
    n_experts = router_probs.shape[-1]
    onehot = jax.nn.one_hot(expert_idx, n_experts)
    w = valid.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    tokens_per = jnp.sum(onehot * w, axis=0) / denom
    prob_per = jnp.sum(router_probs * w, axis=0) / denom
    return jnp.sum(tokens_per * prob_per) * n_experts


class MoEClipAdapter(nn.Module):
    cfg: AdapterConfig = AdapterConfig()
    n_experts: int = 5
    use_switch_gate: bool = False
    use_balance_loss: bool = False

    @nn.compact
    def __call__(self, feats, valid, classifier):
        cfg = self.cfg
        f = _l2norm(feats)
        gate_logits = nn.Dense(self.n_experts, use_bias=False,
                               kernel_init=_kaiming_a5, name="gate")(f)
        probs = jax.nn.softmax(gate_logits, axis=-1)  # [N, E]
        top1 = jnp.argmax(probs, axis=-1)
        if self.use_switch_gate:
            weights = probs * jax.nn.one_hot(top1, self.n_experts)
        else:
            weights = probs
        # stacked experts: one einsum instead of a Python module list
        down = self.param("experts_down", _kaiming_a5,
                          (cfg.c_in, self.n_experts * (cfg.c_in // cfg.reduction)))
        up = self.param("experts_up", _kaiming_a5,
                        (cfg.c_in // cfg.reduction, self.n_experts * cfg.c_in))
        e, r = self.n_experts, cfg.c_in // cfg.reduction
        h = nn.relu(jnp.einsum("nd,der->ner", f, down.reshape(cfg.c_in, e, r)))
        expert_out = nn.relu(jnp.einsum("ner,erd->ned", h,
                                        up.reshape(r, e, cfg.c_in).transpose(1, 0, 2)))
        mix = jnp.einsum("ned,ne->nd", expert_out, weights)
        mix = _l2norm(mix)
        ratio = cfg.clip_ratio / self.n_experts
        image_features = _l2norm(mix * ratio + f * (1 - ratio))
        logits = image_features @ classifier
        pooled = ops.topj_pooling(logits, valid, cfg.topj)
        if self.use_balance_loss:
            if not self.use_switch_gate:
                # reference SwitchGate returns loss None without switch
                # gating (early return before the loss computation)
                raise ValueError("use_balance_loss requires use_switch_gate")
            # the reference feeds the top-1-MASKED gate scores into the loss
            # (``SwitchGate.forward``, model_adapters.py:320-327), not the
            # full softmax
            return pooled, load_balancing_loss(weights, top1, valid)
        return pooled


class AMUAdapter(nn.Module):
    """AMU dual-backbone adapter: CONCH + auxiliary features with
    uncertainty-weighted blending (``Conch_AMUVanilla_Ada``)."""

    cfg: AdapterConfig = AdapterConfig()
    c_in_aux: int = 1024
    aux_ratio: float = 0.1
    uncertainty_type: str = "none"
    uncertainty_power: float = 1.0
    aux_cache_init: tuple | None = None
    # "bottleneck" = Conch_AMUVanilla_Ada; "linear" = Conch_AMUTip_Ada (a
    # cache-model Linear_Adapter on the main branch producing class logits
    # directly, ref model_adapters.py:500-544)
    main_adapter: str = "bottleneck"
    main_cache_init: tuple | None = None

    @nn.compact
    def __call__(self, feats, valid, aux_feats, classifier):
        cfg = self.cfg
        f = _l2norm(feats)
        clip_logits = f @ classifier

        if self.main_adapter == "linear":
            if self.main_cache_init is not None:
                init = lambda *_: jnp.asarray(np.asarray(self.main_cache_init),
                                              jnp.float32)
            else:
                init = _kaiming_a5
            w = self.param("cache_kernel", init, (cfg.c_in, cfg.n_classes))
            adapted_logits = f @ w
        else:
            adapted = _l2norm(
                Bottleneck(cfg.c_in, cfg.reduction, name="adapter")(f))
            adapted_logits = adapted @ classifier

        if self.aux_cache_init is not None:
            aux_init = lambda *_: jnp.asarray(np.asarray(self.aux_cache_init), jnp.float32)
        else:
            aux_init = _kaiming_a5
        aux_w = self.param("aux_kernel", aux_init, (self.c_in_aux, cfg.n_classes))
        aux_logits = _l2norm(aux_feats) @ aux_w

        factor = uncertainty(clip_logits, self.uncertainty_type, self.uncertainty_power)
        logits = (adapted_logits * cfg.clip_ratio
                  + aux_logits * self.aux_ratio * factor
                  + clip_logits * (1 - cfg.clip_ratio - self.aux_ratio))
        pooled = ops.topj_pooling(logits, valid, cfg.topj)
        pooled_aux = ops.topj_pooling(aux_logits, valid, cfg.topj)
        return pooled, pooled_aux


def zero_shot_pooled(feats, valid, classifier, topj: int = 10):
    """The shared ``forward_disable_ada`` baseline: normalized features →
    zero-shot logits → top-j mean."""
    return ops.topj_pooling(_l2norm(feats) @ classifier, valid, topj)
