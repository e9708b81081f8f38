"""Torch MUSK/BEiT3 checkpoint → flax params conversion.

Maps the torchscale state-dict layout (behavioral reference
``/root/reference/models/musk/torchscale/``: multiway-wrapped attention
projections and FFN/LayerNorms with ``A``/``B`` branches,
``multihead_attention.py:43-55``; fairseq-style positional embeddings whose
first two rows are reserved, ``BEiT3.py:32-39``) onto ``moc_tpu.models.musk``:

  * ``nn.Linear [out, in]`` → flax ``[in, out]`` kernels;
  * ``encoder.embed_positions.A`` (vision, ``n_patches+1+2`` rows) /
    ``.B`` (text) → ``vision_pos`` / ``text_pos`` with the 2 reserved
    fairseq rows stripped;
  * ``vision_embed.{proj,cls_token,mask_token}`` → conv kernel NHWC +
    params;
  * heads (``vision_head``/``language_head``) and ``logit_scale``.

Parity is verified end-to-end against the reference torch model itself:
``tests/test_musk_oracle.py`` stubs the inert ``fairscale``/``timm`` imports,
random-inits the reference MUSK on CPU, converts its ``state_dict`` with
:func:`convert_musk_checkpoint`, and asserts the flax forward matches the
torch forward on vision-only / text-only / mixed-modality inputs (masked
positions excluded). ``tests/test_convert_musk.py`` adds structural checks
on synthetic checkpoints.
"""

from __future__ import annotations

import numpy as np

from moc_tpu.zeroshot.convert import _dense, _ln, _np


def _multiway(sd, prefix, leaf_fn):
    out = {}
    for branch in ("A", "B"):
        if f"{prefix}.{branch}.weight" in sd or any(
            k.startswith(f"{prefix}.{branch}.") for k in sd
        ):
            out[branch] = leaf_fn(sd, f"{prefix}.{branch}")
    if not out:  # non-multiway checkpoint: single module → branch A
        out["A"] = leaf_fn(sd, prefix)
    return out


def _ffn_branch(sd, prefix):
    out = {
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
    }
    if f"{prefix}.ffn_layernorm.weight" in sd:
        out["ffn_layernorm"] = _ln(sd, f"{prefix}.ffn_layernorm")
    return out


def _encoder_layer(sd, prefix):
    attn = {}
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        attn[proj] = _multiway(sd, f"{prefix}.self_attn.{proj}", _dense)
    if any(k.startswith(f"{prefix}.self_attn.inner_attn_ln") for k in sd):
        attn["inner_attn_ln"] = _multiway(sd, f"{prefix}.self_attn.inner_attn_ln", _ln)
    return {
        "self_attn": attn,
        "self_attn_layer_norm": _multiway(sd, f"{prefix}.self_attn_layer_norm", _ln),
        "ffn": _multiway(sd, f"{prefix}.ffn", _ffn_branch),
        "final_layer_norm": _multiway(sd, f"{prefix}.final_layer_norm", _ln),
    }


def convert_beit3(sd, prefix: str = "beit3") -> dict:
    """BEiT3 subtree of a MUSK state dict → ``moc_tpu.models.musk.BEiT3``
    params."""
    n_layers = 0
    while any(k.startswith(f"{prefix}.encoder.layers.{n_layers}.") for k in sd):
        n_layers += 1
    out = {
        "text_embed": {"embedding": _np(sd[f"{prefix}.text_embed.weight"])},
        "vision_embed": {
            "proj": {
                "kernel": _np(sd[f"{prefix}.vision_embed.proj.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{prefix}.vision_embed.proj.bias"]),
            },
            "cls_token": _np(sd[f"{prefix}.vision_embed.cls_token"]),
        },
        # fairseq reserves rows 0-1 of each positional table (BEiT3.py:32)
        "vision_pos": _np(sd[f"{prefix}.encoder.embed_positions.A.weight"])[2:],
        "text_pos": _np(sd[f"{prefix}.encoder.embed_positions.B.weight"])[2:],
        "encoder": {
            f"layers_{i}": _encoder_layer(sd, f"{prefix}.encoder.layers.{i}")
            for i in range(n_layers)
        },
    }
    if f"{prefix}.vision_embed.mask_token" in sd:
        out["vision_embed"]["mask_token"] = _np(
            sd[f"{prefix}.vision_embed.mask_token"]
        ).reshape(-1)
    if f"{prefix}.encoder.layer_norm.A.weight" in sd:
        out["encoder"]["layer_norm"] = _multiway(sd, f"{prefix}.encoder.layer_norm", _ln)
    return out


def _cubic_resize_matrix(old: int, new: int, a: float = -0.75) -> np.ndarray:
    """1-D cubic-convolution resampling matrix ``[new, old]`` matching
    ``torch.nn.functional.interpolate(mode='bicubic',
    align_corners=False)``: half-pixel source coordinates, Keys kernel with
    ``a = -0.75``, edge-replicated borders."""
    w = np.zeros((new, old), np.float64)
    for i in range(new):
        x = (i + 0.5) * old / new - 0.5
        i0 = int(np.floor(x))
        t = x - i0
        for tap, s in enumerate((1.0 + t, t, 1.0 - t, 2.0 - t)):
            s = abs(s)
            if s <= 1.0:
                coef = (a + 2.0) * s ** 3 - (a + 3.0) * s ** 2 + 1.0
            elif s < 2.0:
                coef = a * s ** 3 - 5.0 * a * s ** 2 + 8.0 * a * s - 4.0 * a
            else:
                coef = 0.0
            w[i, min(max(i0 - 1 + tap, 0), old - 1)] += coef
    return w.astype(np.float32)


def interpolate_vision_pos(vision_pos: np.ndarray,
                           new_num_patches: int) -> np.ndarray:
    """Bicubic pos-embed interpolation for a different image size
    (ref ``load_model_and_may_interpolate``, ``musk/utils.py:193-235``:
    cls/extra rows kept, grid rows resized bicubic ``align_corners=False``).
    ``vision_pos [1+num_patches, D]`` (reserved fairseq rows already
    stripped, cls first). The resampling matrices replicate torch's cubic
    kernel (``a=-0.75``) exactly — ``jax.image.resize`` uses Keys ``a=-0.5``
    and would drift from checkpoints interpolated by the reference."""
    old_patches = vision_pos.shape[0] - 1
    if old_patches == new_num_patches:
        return vision_pos
    og = int(round(old_patches ** 0.5))
    ng = int(round(new_num_patches ** 0.5))
    grid = vision_pos[1:].reshape(og, og, -1).astype(np.float32)
    w = _cubic_resize_matrix(og, ng)
    # rows then cols: [ng, og]@[og, og, D] → [ng, og, D] → [ng, ng, D]
    tmp = np.tensordot(w, grid, axes=(1, 0))  # [ng, og, D]
    res = np.tensordot(w, tmp.transpose(1, 0, 2), axes=(1, 0))  # [ng, ng, D]
    res = res.transpose(1, 0, 2).reshape(ng * ng, -1)
    return np.concatenate([vision_pos[:1], res.astype(vision_pos.dtype)])


def convert_musk_checkpoint(state_dict, num_patches: int | None = None,
                            max_text_len: int | None = None) -> dict:
    """Full MUSK state dict → ``{"params": ...}`` for
    ``moc_tpu.models.musk.MUSK``. ``num_patches`` (target ``(image_size //
    patch_size)**2``) triggers bicubic pos-embed interpolation when it
    differs from the checkpoint's grid. ``max_text_len`` truncates the text
    positional table: release checkpoints carry the full fairseq
    ``max_source_positions`` table (1022 usable rows for
    ``musk_large_patch16_384``) of which the model only ever indexes the
    first ``max_text_len`` (ref ``modeling.py:113-118`` slices positions by
    sequence length; caught by the full-shape drill,
    ``tests/test_fullshape_ckpt.py``)."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    if any(k.startswith("model.") for k in sd):  # timm checkpoint nesting
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
    params = {"beit3": convert_beit3(sd, "beit3")}
    if num_patches is not None:
        params["beit3"]["vision_pos"] = interpolate_vision_pos(
            params["beit3"]["vision_pos"], num_patches)
    if max_text_len is not None:
        params["beit3"]["text_pos"] = params["beit3"]["text_pos"][:max_text_len]
    for head in ("vision_head", "language_head"):
        if f"{head}.weight" in sd:
            params[head] = _dense(sd, head)
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return {"params": params}


def load_musk(checkpoint_path: str, cfg=None):
    """Load a MUSK release checkpoint → (flax ``MUSK`` module, params)."""
    import torch

    from moc_tpu.models.musk import MUSK, MuskConfig

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    cfg = cfg or MuskConfig()
    params = convert_musk_checkpoint(
        sd, num_patches=(cfg.image_size // cfg.patch_size) ** 2,
        max_text_len=cfg.max_text_len)
    return MUSK(cfg), params
