"""TITAN-style coordinate-aware slide encoder + linear probe head.

Behavioral reference ``/root/reference/models/model_titan.py:17-59``: the
reference wraps the proprietary HF ``MahmoodLab/TITAN`` slide encoder
(``trust_remote_code``) — patch features + patch coords → one slide
embedding — and trains a linear head on top. That remote code cannot be
vendored; this module provides the equivalent capability natively: patch
coordinates are normalized to a grid, embedded with learned 2D positional
MLPs, and a small transformer with a CLS token pools the bag into a slide
embedding consumed by the linear classifier. The API matches the reference
head: ``(feats, coords, valid) -> logits``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.transformer import LayerNorm, Transformer


@dataclasses.dataclass(frozen=True)
class TitanConfig:
    n_classes: int = 2
    in_dim: int = 512  # CONCH v1.5 patch features in the reference
    dim: int = 512
    num_layers: int = 4
    num_heads: int = 8
    patch_spacing: float = 512.0  # coord units per patch step (ref target_patch_size)


class TitanHead(nn.Module):
    cfg: TitanConfig = TitanConfig()

    @nn.compact
    def __call__(self, feats, coords, valid, *, train: bool = False):
        """``feats [N, D]``, ``coords [N, 2]`` (slide pixel coords), ``valid
        [N]`` → ``{"logits": [C], "slide_embedding": [dim]}``."""
        cfg = self.cfg
        n = feats.shape[0]
        x = nn.Dense(cfg.dim, name="proj")(feats)

        # grid-normalized coordinates → sinusoid features → learned embedding
        grid = coords.astype(jnp.float32) / cfg.patch_spacing  # [N, 2]
        grid = grid - jnp.min(jnp.where(valid[:, None], grid, jnp.inf), axis=0)
        freqs = 2.0 ** jnp.arange(8)
        ang = grid[:, :, None] * freqs[None, None, :] * (2 * jnp.pi / 256.0)
        pos_feats = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1
        ).reshape(n, -1)  # [N, 32]
        x = x + nn.Dense(cfg.dim, name="pos_embed")(pos_feats)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, cfg.dim))
        x = jnp.concatenate([cls, x], axis=0)
        token_valid = jnp.concatenate([jnp.ones((1,), bool), valid])
        # additive key mask: pads unattendable
        mask = jnp.where(token_valid[None, None, None, :], 0.0, -jnp.inf)
        x = Transformer(cfg.dim, cfg.num_layers, cfg.num_heads,
                        name="encoder")(x[None], mask)[0]
        slide_emb = LayerNorm(name="norm")(x[0])
        logits = nn.Dense(cfg.n_classes, name="head")(slide_emb)
        return {"logits": logits, "slide_embedding": slide_emb}


class TitanEncoderUnavailable(RuntimeError):
    """Raised when a checkpoint's ``titan.*`` encoder subtree is asked for.

    The published ``MahmoodLab/TITAN`` slide encoder ships exclusively as HF
    ``trust_remote_code`` (``/root/reference/models/model_titan.py:20``): its
    parameter schema is defined by Python files fetched from the Hub at load
    time, which the reference repo does not vendor and a zero-egress
    environment cannot fetch (see MIGRATING.md "TITAN weight interop" for the
    recorded evidence). The subtree is therefore structurally opaque offline
    — failing loudly beats silently dropping weights.
    """


def convert_titan_probe(state_dict: dict, n_classes: int) -> dict:
    """Reference ``TITAN`` wrapper checkpoint → params for the linear probe.

    What IS pinned offline by ``model_titan.py:17-59`` — and drilled in
    ``tests/test_fullshape_ckpt.py`` — is the *wrapper-level* layout:

      * ``mlp.weight [C, 768]`` / ``mlp.bias [C]`` — the linear probe over
        the 768-d slide embedding (init normal(0.01)/zeros, lines 22-24),
        the only part the reference ever trains with ``only_train_mlp``;
      * ``titan.*`` — the opaque remote-code encoder subtree;
      * the reference eval-harness cleaning semantics (``.module`` strip,
        ``instance_loss_fn`` skip) apply before inspection.

    Returns flax params for ``TitanHead``'s ``head`` Dense (the linear probe;
    usable whenever slide embeddings come from elsewhere — e.g. the
    reference's own ``forward_patch_level`` applies ``mlp`` straight to
    patch features). NOTE: this converts the probe ONLY and ignores any
    other keys — use :func:`load_titan_probe_checkpoint` (the guarded
    entry) to refuse checkpoints carrying an unconvertible ``titan.*``
    encoder subtree instead of silently dropping it.
    """
    from moc_tpu.models.convert_mil import clean_torch_state_dict, _np

    sd = clean_torch_state_dict(state_dict)
    w = _np(sd["mlp.weight"])
    b = _np(sd["mlp.bias"])
    if w.shape != (n_classes, 768):
        raise ValueError(
            f"TITAN probe weight is {w.shape}; the reference pins "
            f"[{n_classes}, 768] (Linear(768, num_classes), "
            "model_titan.py:22)")
    return {"head": {"kernel": w.T.copy(), "bias": b}}


def titan_encoder_keys(state_dict: dict) -> list[str]:
    """The opaque ``titan.*`` subtree of a reference TITAN checkpoint (after
    reference cleaning). Use to detect/report the unconvertible part."""
    from moc_tpu.models.convert_mil import clean_torch_state_dict

    return sorted(k for k in clean_torch_state_dict(state_dict)
                  if k.startswith("titan."))


def load_titan_probe_checkpoint(path: str, n_classes: int,
                                allow_encoder_drop: bool = False) -> dict:
    """Load a reference-trained TITAN wrapper checkpoint's linear probe.

    By default refuses checkpoints that carry encoder weights (the
    ``titan.*`` subtree cannot be mapped offline — dropping it silently
    would produce a model that LOOKS converted but runs a different
    encoder); pass ``allow_encoder_drop=True`` to accept the probe alone
    after reading the error's guidance.
    """
    import torch

    from moc_tpu.models.convert_mil import clean_torch_state_dict

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = clean_torch_state_dict(sd)  # once; the helpers' re-clean is a no-op
    enc = titan_encoder_keys(sd)
    if enc and not allow_encoder_drop:
        raise TitanEncoderUnavailable(
            f"checkpoint carries {len(enc)} 'titan.*' encoder parameters "
            f"(e.g. {enc[:3]}); the published encoder's schema is HF "
            "remote code and cannot be converted offline — pass "
            "allow_encoder_drop=True to load ONLY the linear probe onto "
            "moc_tpu's native TitanHead (different encoder, same probe)")
    return convert_titan_probe(sd, n_classes)
