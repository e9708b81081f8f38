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

No runnable reference oracle exists in this environment (torchscale imports
fairscale at module scope), so correctness is covered by structural tests:
synthetic checkpoints of matching shapes convert into trees that initialize
and forward identically shaped models, with spot-checked value mappings.
"""

from __future__ import annotations

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


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


def convert_musk_checkpoint(state_dict) -> dict:
    """Full MUSK state dict → ``{"params": ...}`` for
    ``moc_tpu.models.musk.MUSK``."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    if any(k.startswith("model.") for k in sd):  # timm checkpoint nesting
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
    params = {"beit3": convert_beit3(sd, "beit3")}
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
    params = convert_musk_checkpoint(sd)
    return MUSK(cfg or MuskConfig()), params
