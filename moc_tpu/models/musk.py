"""MUSK-equivalent dual-tower vision-language model (BEiT3 backbone).

Behavioral reference ``/root/reference/models/musk/``: a BEiT3 multiway
encoder (``torchscale/model/BEiT3.py:16-96``) — conv-patchified vision
tokens + text tokens share one encoder whose FFN/LayerNorms are duplicated
per modality and routed by the split position — with linear vision/language
heads and a contrastive logit scale (``modeling.py:96-175``), plus the
multiscale chessboard-tiling inference trick (``utils.py:34-98``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.encoder import Encoder, EncoderConfig


@dataclasses.dataclass(frozen=True)
class MuskConfig:
    image_size: int = 384
    patch_size: int = 16
    vocab_size: int = 64010
    max_text_len: int = 100
    embed_dim: int = 1024
    out_dim: int = 1024  # contrastive embedding dim
    encoder: EncoderConfig = EncoderConfig(embed_dim=1024, ffn_dim=4096,
                                           layers=24, heads=16, multiway=True)


class VisionEmbedding(nn.Module):
    """Conv patchify + cls token (+ optional mask token substitution), ref
    ``component/embedding.py:28-92``."""

    cfg: MuskConfig

    @nn.compact
    def __call__(self, images, masked_pos=None):
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="proj")(images)
        x = x.reshape(b, -1, c.embed_dim)
        # always materialized (ref ``contain_mask_token=True``) so converted
        # checkpoints and init trees align even without masked pretraining
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (c.embed_dim,))
        if masked_pos is not None:
            x = jnp.where(masked_pos[:, :, None], mask_token, x)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim))
        return jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.embed_dim)), x], axis=1)


class BEiT3(nn.Module):
    """Multiway encoder over [vision; text] token streams
    (ref ``BEiT3.py:48-96``: VISION tokens come first and set the multiway
    split — branch A of every multiway module serves vision positions,
    branch B text; single-modality calls use A alone)."""

    cfg: MuskConfig

    @nn.compact
    def __call__(self, textual_tokens=None, visual_tokens=None,
                 text_padding_mask=None, vision_masked_pos=None):
        c = self.cfg
        assert textual_tokens is not None or visual_tokens is not None
        parts, pads = [], []
        # split semantics (ref BEiT3.forward: -1 = all-A/vision, 0 = all-B/
        # text, n_vis = mixed): None routes everything through A.
        split = None if textual_tokens is None else 0
        if visual_tokens is not None:
            v = VisionEmbedding(c, name="vision_embed")(visual_tokens, vision_masked_pos)
            n_vis = (c.image_size // c.patch_size) ** 2 + 1
            vpos = self.param("vision_pos", nn.initializers.normal(0.02),
                              (n_vis, c.embed_dim))
            v = v + vpos[: v.shape[1]]
            parts.append(v)
            pads.append(jnp.zeros(v.shape[:2], bool))
            split = v.shape[1] if textual_tokens is not None else None
        if textual_tokens is not None:
            t = nn.Embed(c.vocab_size, c.embed_dim, name="text_embed")(textual_tokens)
            tpos = self.param("text_pos", nn.initializers.normal(0.02),
                              (c.max_text_len, c.embed_dim))
            t = t + tpos[: t.shape[1]]
            parts.append(t)
            pads.append(
                text_padding_mask if text_padding_mask is not None
                else jnp.zeros(t.shape[:2], bool)
            )
        x = jnp.concatenate(parts, axis=1)
        padding = jnp.concatenate(pads, axis=1)
        cfg_enc = dataclasses.replace(self.cfg.encoder, embed_dim=c.embed_dim)
        out, aux = Encoder(cfg_enc, name="encoder")(
            x, padding_mask=padding,
            split=split if cfg_enc.multiway else None,
        )
        return out, aux


from moc_tpu.models.layers import l2norm as _l2norm  # noqa: E402  (shared def)


class MUSK(nn.Module):
    """Vision/language heads over BEiT3 cls tokens + logit scale
    (ref ``modeling.py:96-175``)."""

    cfg: MuskConfig = MuskConfig()

    def setup(self):
        self.beit3 = BEiT3(self.cfg, name="beit3")
        # bias-free heads, matching ``modeling.py:102-103``
        self.vision_head = nn.Dense(self.cfg.out_dim, use_bias=False, name="vision_head")
        self.language_head = nn.Dense(self.cfg.out_dim, use_bias=False, name="language_head")
        self.logit_scale = self.param("logit_scale", lambda *_: jnp.log(1 / 0.07))

    def __call__(self, images=None, token_ids=None, text_padding_mask=None,
                 normalize: bool = True):
        vision_cls = text_cls = None
        if images is not None:
            out, _ = self.beit3(visual_tokens=images)
            vision_cls = self.vision_head(out[:, 0])
            if normalize:
                vision_cls = _l2norm(vision_cls)
        if token_ids is not None:
            out, _ = self.beit3(textual_tokens=token_ids,
                                text_padding_mask=text_padding_mask)
            text_cls = self.language_head(out[:, 0])
            if normalize:
                text_cls = _l2norm(text_cls)
        return vision_cls, text_cls, jnp.exp(self.logit_scale)


def split_chessboard(x: jax.Array, num_split: int) -> jax.Array:
    """``[B, H, W, C] -> [B*s², H/s, W/s, C]`` tile batching
    (ref ``utils.py:34-42``)."""
    b, h, w, c = x.shape
    s = num_split
    x = x.reshape(b, s, h // s, s, w // s, c)
    return x.transpose(1, 3, 0, 2, 4, 5).reshape(b * s * s, h // s, w // s, c)


def multiscale_image_features(apply_fn, images: jax.Array,
                              scales=(1, 2)) -> jax.Array:
    """MUSK ``ms_aug`` multiscale inference (ref ``utils.py:69-98``): resize
    to s×base, chessboard-split into s² base-size tiles, encode each, mean
    over tiles per scale, concatenate scale features.

    The upsample is torch-exact bicubic (``F.interpolate(mode='bicubic')``,
    Keys a=−0.75 — the same separable matrix the MUSK pos-embed converter
    uses; jax's built-in cubic is a=−0.5 and its bilinear diverges from
    the reference tiles)."""
    b, base, _, c = images.shape
    feats = []
    for s in scales:
        if s == 1:
            tiles = images
        else:
            from moc_tpu.zeroshot.convert_musk import _cubic_resize_matrix

            m = jnp.asarray(_cubic_resize_matrix(base, base * s),
                            images.dtype)  # [base*s, base]
            big = jnp.einsum("rh,bhwc->brwc", m, images)
            big = jnp.einsum("sw,brwc->brsc", m, big)
            tiles = split_chessboard(big, s)
        emb = apply_fn(tiles)  # [B*s², D]
        emb = emb.reshape(s * s, b, -1).mean(axis=0)
        feats.append(emb)
    return jnp.concatenate(feats, axis=-1)
