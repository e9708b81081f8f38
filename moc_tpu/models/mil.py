"""Max-pooling instance MIL heads (MIL-fc binary / multiclass).

Behavioral reference ``/root/reference/models/model_mil.py:11-101``:
  * binary: per-patch 2-way classifier; slide logits = logits of the patch
    with the highest class-1 probability (top_k=1);
  * multiclass: per-class 1-d heads; slide prediction = the (patch, class)
    cell with the global max probability; slide logits = that patch's row.

Masked for padded bags; vmap over slides.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.models.layers import NEG_INF, StackedDense

MIL_SIZES = {"small": (1024, 512), "benchmark": (384, 512), "conch": (512, 512)}


@dataclasses.dataclass(frozen=True)
class MilFcConfig:
    n_classes: int = 2
    size_arg: str = "conch"
    dropout: float = 0.0
    top_k: int = 1


class MILFc(nn.Module):
    """Binary instance-max MIL (ref ``MIL_fc``)."""

    cfg: MilFcConfig = MilFcConfig()

    @nn.compact
    def __call__(self, feats, valid, *, train: bool = False):
        cfg = self.cfg
        assert cfg.n_classes == 2
        _, hidden = MIL_SIZES[cfg.size_arg]
        h = nn.relu(nn.Dense(hidden, name="fc")(feats))
        if cfg.dropout:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        logits = nn.Dense(cfg.n_classes, name="classifier")(h)  # [N, 2]
        probs = jax.nn.softmax(logits, axis=1)
        key = jnp.where(valid, probs[:, 1], NEG_INF)
        top_idx = jnp.argmax(key)
        return {"logits": logits[top_idx], "patch_probs": probs, "top_idx": top_idx}


class MILFcMC(nn.Module):
    """Multiclass instance-max MIL (ref ``MIL_fc_mc``)."""

    cfg: MilFcConfig = MilFcConfig(n_classes=3)

    @nn.compact
    def __call__(self, feats, valid, *, train: bool = False):
        cfg = self.cfg
        assert cfg.n_classes > 2
        _, hidden = MIL_SIZES[cfg.size_arg]
        h = nn.relu(nn.Dense(hidden, name="fc")(feats))
        if cfg.dropout:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        logits = StackedDense(cfg.n_classes, 1, name="classifiers")(h)[..., 0]  # [N, C]
        probs = jax.nn.softmax(logits, axis=1)
        masked = jnp.where(valid[:, None], probs, NEG_INF)
        flat_idx = jnp.argmax(masked)
        top_patch = flat_idx // cfg.n_classes
        return {
            "logits": logits[top_patch],
            "patch_probs": probs,
            "top_idx": top_patch,
            "y_hat": flat_idx % cfg.n_classes,
        }
