"""CHIEF: gated-attention MIL conditioned on an anatomical-site text embedding.

Behavioral reference ``/root/reference/models/model_chief.py:82-195``: gated
attention pooling of projected patch features; a per-site text embedding
(19 anatomical sites × 768, produced offline by a text encoder) is projected
into feature space and ADDED to the pooled slide embedding before the
classifier. The reference loads the site-embedding table from a hard-coded
user path; here it is an explicit constructor argument (random init when
absent, for from-scratch training).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from moc_tpu.models.layers import AttnNet, GatedAttnNet, masked_attention_weights

CHIEF_SIZES = {
    "xs": (384, 256, 256),
    "small": (768, 512, 256),
    "big": (1024, 512, 384),
    "large": (2048, 1024, 512),
    "conch": (512, 512, 384),
}

N_ANATOMICAL_SITES = 19
TEXT_EMBED_DIM = 768


@dataclasses.dataclass(frozen=True)
class ChiefConfig:
    n_classes: int = 2
    size_arg: str = "large"
    gate: bool = True
    dropout: float = 0.25


class CHIEF(nn.Module):
    cfg: ChiefConfig = ChiefConfig()
    site_embeddings: tuple | None = None  # [19, 768] rows from the CHIEF release

    def setup(self):
        cfg = self.cfg
        _, hidden, attn_hidden = CHIEF_SIZES[cfg.size_arg]
        self._hidden = hidden
        self.fc = nn.Dense(hidden, name="fc")
        attn_cls = GatedAttnNet if cfg.gate else AttnNet
        self.attn = attn_cls(attn_hidden, 1, cfg.dropout, name="attn")
        self.text_to_vision = nn.Dense(hidden, name="text_to_vision")
        self.classifiers = nn.Dense(cfg.n_classes, name="classifiers")
        if cfg.dropout:
            self.feat_drop = nn.Dropout(cfg.dropout)
            self.site_drop = nn.Dropout(cfg.dropout)
        if self.site_embeddings is None:
            self.organ_embedding = self.param(
                "organ_embedding", nn.initializers.normal(1.0),
                (N_ANATOMICAL_SITES, TEXT_EMBED_DIM),
            )
        else:
            self.organ_embedding = jnp.asarray(
                np.asarray(self.site_embeddings), jnp.float32
            )

    def _site_vec(self, anatomic, train):
        site = self.organ_embedding[jnp.asarray(anatomic)]
        site = nn.relu(self.text_to_vision(site))
        if self.cfg.dropout:
            site = self.site_drop(site, deterministic=not train)
        return site

    def _embed(self, feats, valid, train):
        h = nn.relu(self.fc(feats))
        if self.cfg.dropout:
            h = self.feat_drop(h, deterministic=not train)
        scores = self.attn(h, train=train).T  # [1, N]
        return h, scores

    def __call__(self, feats, valid, anatomic: int | jnp.ndarray = 0,
                 *, train: bool = False):
        h, scores = self._embed(feats, valid, train)
        weights = masked_attention_weights(scores, valid)
        pooled_h = (weights @ h)[0]
        m = pooled_h + self._site_vec(anatomic, train)
        logits = self.classifiers(m)
        return {
            "logits": logits,
            "attention": scores,
            # the exported slide embedding pools the RAW input features
            # (ref ``slide_embeddings = A @ h_ori``, model_chief.py:136,148)
            # — NOT the hidden pooling the logits use (review r3)
            "wsi_feature": (weights @ feats)[0],
            "wsi_feature_anatomical": m,
        }

    def patch_probs(self, feats, valid, anatomic: int | jnp.ndarray = 0):
        """Heatmap scores (ref ``patch_probs``, ``model_chief.py:173-195``):
        ``sigmoid(attention) × P(class 1 | patch)`` plus the bag probability."""
        h, scores = self._embed(feats, valid, train=False)
        weights = masked_attention_weights(scores, valid)
        site = self._site_vec(anatomic, train=False)
        m = (weights @ h)[0] + site
        bag_prob = jax.nn.softmax(self.classifiers(m))
        patch_logits = self.classifiers(h + site[None, :])
        patch_prob = jax.nn.sigmoid(scores[0]) * jax.nn.softmax(patch_logits, axis=1)[:, 1]
        return {
            "bag_prob": bag_prob,
            "patch_prob": jnp.where(valid, patch_prob, 0.0),
            "attention_raw": scores[0],
        }
