"""torchvision ResNet-50 checkpoint → flax ``ResNet50Trunk`` variables.

The reference's CLAM-legacy patch encoder (``resnet50_baseline``,
``/root/reference/models/resnet_custom.py:115-127``) loads the torchvision
ImageNet ``resnet50`` zoo file with ``strict=False`` — blocks 1-3 of the
standard layout, ``layer4``/``fc`` silently unused. This converter does the
same re-layout onto :class:`moc_tpu.nn.resnet.ResNet50Trunk` (host-side,
torch only for file reading): conv kernels ``[out, in, kh, kw]`` →
``[kh, kw, in, out]``, BatchNorm ``weight/bias`` → ``scale/bias`` params and
``running_mean/var`` → ``batch_stats``, torch ``layer<s>.<b>.*`` names →
flax ``layer<s>_<b>`` submodules.
"""

from __future__ import annotations

import numpy as np

# (stage blocks) of the truncated trunk — ref resnet50_baseline layers[0:3]
_STAGES = (3, 4, 6)


def _kernel(t) -> np.ndarray:
    return np.asarray(t, np.float32).transpose(2, 3, 1, 0)


def _bn(sd, prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
              "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
             "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}
    return params, stats


def convert_resnet50(state_dict: dict) -> dict:
    """torchvision ``resnet50`` state_dict → ``{"params", "batch_stats"}``
    for ``ResNet50Trunk`` (extra keys — ``layer4``, ``fc`` — are ignored,
    matching the reference's ``strict=False`` load)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    params: dict = {"conv1": {"kernel": _kernel(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for stage, n_blocks in enumerate(_STAGES):
        for block in range(n_blocks):
            t = f"layer{stage + 1}.{block}"
            name = f"layer{stage + 1}_{block}"
            p: dict = {}
            s: dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _kernel(sd[f"{t}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _kernel(sd[f"{t}.downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}


def load_resnet50(path: str):
    """Read a torch ``.pth`` (bare state_dict, or ``{"state_dict": ...}``)
    and return ``(ResNet50Trunk(), variables)`` ready for
    ``model.apply(variables, images)`` → ``[B, 1024]`` features."""
    import torch

    from moc_tpu.nn.resnet import ResNet50Trunk

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return ResNet50Trunk(), convert_resnet50(sd)
