"""Torch CONCH checkpoint → flax params conversion.

Maps the open_clip CoCa state-dict layout (see behavioral reference
``/root/reference/models/conch/open_clip_custom/{transformer,vision_tower,
coca_model}.py``) onto the ``moc_tpu.zeroshot`` module trees:

  * torch ``nn.Linear`` ``[out, in]`` weights → flax ``[in, out]`` kernels;
  * fused self-attention ``in_proj_weight``/``bias`` → ``attn.in_proj``;
  * unfused pooler ``{q,k,v}_proj_weight`` + 3-way-split ``in_proj_bias`` →
    ``CrossAttention`` q/k/v Dense params;
  * timm trunk naming (``norm1``, ``attn.qkv``, ``mlp.fc1`` …) → the shared
    block naming (``ln_1``, ``attn.in_proj``, ``mlp.c_fc`` …);
  * patch conv ``[D, 3, p, p]`` → flax ``[p, p, 3, D]``;
  * ``pos_embed`` bilinearly resampled when the image size differs
    (ref ``coca_model.py:348-370``).

The caption decoder weights present in CONCH checkpoints are ignored (the
frozen-encoder workloads never run it).
"""

from __future__ import annotations

import numpy as np

from moc_tpu.nn.vit import resample_pos_embed


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _dense(sd, prefix):
    """torch Linear → flax Dense leaves; bias optional (MUSK heads are
    bias-free). THE shared leaf converters — convert_musk imports these."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _self_attn(sd, prefix):
    return {
        "in_proj": {
            "kernel": _np(sd[f"{prefix}.in_proj_weight"]).T,
            "bias": _np(sd[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _cross_attn(sd, prefix, dim):
    """Cross-attention (pooler) projection split.

    torch ``nn.MultiheadAttention`` stores SEPARATE ``{q,k,v}_proj_weight``
    only when ``kdim/vdim != embed_dim`` (the contrast pooler: d_model 512 vs
    trunk 768); when they match (the caption pooler: 768/768) it packs a
    FUSED ``in_proj_weight`` instead — both layouts appear inside one release
    checkpoint, so both are handled (caught by the full-shape fabricated-
    checkpoint drill, ``tests/test_fullshape_ckpt.py``)."""
    bias = _np(sd[f"{prefix}.in_proj_bias"])
    qb, kb, vb = bias[:dim], bias[dim : 2 * dim], bias[2 * dim :]
    if f"{prefix}.in_proj_weight" in sd:  # fused qkv (kdim == embed_dim)
        wq, wk, wv = np.split(_np(sd[f"{prefix}.in_proj_weight"]), 3, axis=0)
    else:
        wq = _np(sd[f"{prefix}.q_proj_weight"])
        wk = _np(sd[f"{prefix}.k_proj_weight"])
        wv = _np(sd[f"{prefix}.v_proj_weight"])
    return {
        "q_proj": {"kernel": wq.T, "bias": qb},
        "k_proj": {"kernel": wk.T, "bias": kb},
        "v_proj": {"kernel": wv.T, "bias": vb},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _resblock_openclip(sd, prefix):
    """CONCH text-tower block: ln_1/attn/ln_2/mlp(c_fc,c_proj)."""
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn": _self_attn(sd, f"{prefix}.attn"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": {
            "c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def _resblock_timm(sd, prefix):
    """timm ViT block: norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2."""
    return {
        "ln_1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "in_proj": {
                "kernel": _np(sd[f"{prefix}.attn.qkv.weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.qkv.bias"]),
            },
            "out_proj": _dense(sd, f"{prefix}.attn.proj"),
        },
        "ln_2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "c_fc": _dense(sd, f"{prefix}.mlp.fc1"),
            "c_proj": _dense(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _count_layers(sd, pattern):
    i = 0
    while any(k.startswith(pattern.format(i)) for k in sd):
        i += 1
    return i


def _pooler(sd, prefix, dim):
    return {
        "query": _np(sd[f"{prefix}.query"]),
        "ln_q": _ln(sd, f"{prefix}.ln_q"),
        "ln_k": _ln(sd, f"{prefix}.ln_k"),
        "attn": _cross_attn(sd, f"{prefix}.attn", dim),
    }


def convert_text_tower(sd, prefix: str = "text") -> dict:
    n = _count_layers(sd, prefix + ".transformer.resblocks.{}.")
    return {
        "token_embedding": {"embedding": _np(sd[f"{prefix}.token_embedding.weight"])},
        "cls_emb": _np(sd[f"{prefix}.cls_emb"]),
        "positional_embedding": _np(sd[f"{prefix}.positional_embedding"]),
        "transformer": {
            f"resblocks_{i}": _resblock_openclip(sd, f"{prefix}.transformer.resblocks.{i}")
            for i in range(n)
        },
        "ln_final": _ln(sd, f"{prefix}.ln_final"),
        "text_projection": _np(sd[f"{prefix}.text_projection"]),
    }


def convert_vision_tower(sd, prefix: str = "visual", image_size: int = 448,
                         patch_size: int = 16) -> dict:
    n = _count_layers(sd, prefix + ".trunk.blocks.{}.")
    pos = _np(sd[f"{prefix}.trunk.pos_embed"])
    new_grid = image_size // patch_size
    if pos.shape[1] != new_grid * new_grid + 1:
        pos = np.asarray(resample_pos_embed(pos, new_grid))
    contrast_dim = _np(sd[f"{prefix}.attn_pool_contrast.query"]).shape[-1]
    caption_dim = _np(sd[f"{prefix}.attn_pool_caption.query"]).shape[-1]
    return {
        "trunk": {
            "patch_embed": {
                "kernel": _np(sd[f"{prefix}.trunk.patch_embed.proj.weight"])
                .transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{prefix}.trunk.patch_embed.proj.bias"]),
            },
            "cls_token": _np(sd[f"{prefix}.trunk.cls_token"]),
            "pos_embed": pos,
            "blocks": {
                f"resblocks_{i}": _resblock_timm(sd, f"{prefix}.trunk.blocks.{i}")
                for i in range(n)
            },
            "norm": _ln(sd, f"{prefix}.trunk.norm"),
        },
        "attn_pool_contrast": _pooler(sd, f"{prefix}.attn_pool_contrast", contrast_dim),
        "ln_contrast": _ln(sd, f"{prefix}.ln_contrast"),
        "proj_contrast": _np(sd[f"{prefix}.proj_contrast"]),
        "attn_pool_caption": _pooler(sd, f"{prefix}.attn_pool_caption", caption_dim),
        "ln_caption": _ln(sd, f"{prefix}.ln_caption"),
    }


def convert_conch_checkpoint(state_dict, image_size: int = 448,
                             patch_size: int = 16) -> dict:
    """Full CoCa state dict → ``{"params": ...}`` for ``moc_tpu.zeroshot.CoCa``."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    params = {
        "text": convert_text_tower(sd, "text"),
        "visual": convert_vision_tower(sd, "visual", image_size, patch_size),
    }
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return {"params": params}


def load_conch(checkpoint_path: str, image_size: int = 448,
               attn_impl: str = "dense"):
    """Load a CONCH release checkpoint → (flax ``CoCa`` module, params).

    Equivalent of ``create_model_from_pretrained`` (ref ``factory.py:79-113``)
    minus the image transform (see ``moc_tpu.zeroshot.transform``).
    ``attn_impl="flash"`` runs the vision trunk on the Pallas kernel
    (weights unchanged). A memory-headroom knob only — dense measured
    faster at 448px tower length (BENCH_NOTES r3 session 7).
    """
    import torch

    from moc_tpu.zeroshot.coca import CoCa, CoCaConfig
    from moc_tpu.zeroshot.text_tower import TextConfig
    from moc_tpu.zeroshot.vision_tower import VisionConfig

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    params = convert_conch_checkpoint(sd, image_size=image_size)
    cfg = CoCaConfig(text=TextConfig(), vision=VisionConfig(
        image_size=image_size, attn_impl=attn_impl))
    return CoCa(cfg), params
