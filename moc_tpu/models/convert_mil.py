"""Torch CLAM/ABMIL checkpoint → flax params conversion.

Behavioral reference ``/root/reference/utils/eval_utils.py:45-57``: the
eval harness loads a ``state_dict``, strips ``.module`` (DataParallel)
prefixes, skips ``instance_loss_fn`` buffers, and loads strictly. Here the
cleaned dict is additionally re-laid-out onto ``moc_tpu.models.clam.CLAM``:

  * ``attention_net.0``             → ``fc``              (bag projection)
  * ``attention_net.{i}.attention_a.0`` → ``attn.fc_a``   (tanh branch)
  * ``attention_net.{i}.attention_b.0`` → ``attn.fc_b``   (sigmoid gate)
  * ``attention_net.{i}.attention_c``   → ``attn.score``
  * ``classifiers``                 → SB dense / MB stacked heads
  * ``instance_classifiers.{c}``    → stacked ``[C, D, 2]`` heads

(the ``{i}`` Sequential index is 2 without dropout, 3 with — resolved by
key scan; ref ``model_clam.py:84-93``). torch ``nn.Linear`` stores
``weight [out, in]``; flax kernels are ``[in, out]``.
"""

from __future__ import annotations

import numpy as np

from moc_tpu.models.clam import CLAM, ClamConfig


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def clean_torch_state_dict(sd: dict) -> dict:
    """The reference checkpoint cleaner (``eval_utils.py:49-57``)."""
    return {k.replace(".module", ""): v for k, v in sd.items()
            if "instance_loss_fn" not in k}


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_clam_checkpoint(state_dict: dict, cfg: ClamConfig) -> dict:
    """Cleaned torch CLAM state dict → ``{"params": ...}`` for ``CLAM``."""
    sd = clean_torch_state_dict(state_dict)
    # Sequential index of the gated attention net: 2 (fc, relu, attn) or
    # 3 with dropout (fc, relu, dropout, attn)
    ai = next(int(k.split(".")[1]) for k in sd
              if k.startswith("attention_net.") and "attention_a" in k)
    params = {
        "fc": _dense(sd, "attention_net.0"),
        "attn": {
            "fc_a": _dense(sd, f"attention_net.{ai}.attention_a.0"),
            "fc_b": _dense(sd, f"attention_net.{ai}.attention_b.0"),
            "score": _dense(sd, f"attention_net.{ai}.attention_c"),
        },
    }
    c = cfg.n_classes
    if cfg.multi_branch:
        # ModuleList of per-class Linear(hidden, 1) → stacked [C, hidden, 1]
        params["classifiers"] = {
            "kernel": np.stack([_np(sd[f"classifiers.{i}.weight"]).T
                                for i in range(c)]),
            "bias": np.stack([_np(sd[f"classifiers.{i}.bias"])
                              for i in range(c)]),
        }
    else:
        params["classifiers"] = _dense(sd, "classifiers")
    if any(k.startswith("instance_classifiers.") for k in sd):
        params["instance_classifiers"] = {
            "kernel": np.stack([_np(sd[f"instance_classifiers.{i}.weight"]).T
                                for i in range(c)]),
            "bias": np.stack([_np(sd[f"instance_classifiers.{i}.bias"])
                              for i in range(c)]),
        }
    return {"params": params}


def load_torch_mil_checkpoint(path: str, cfg: ClamConfig):
    """Load a reference-trained CLAM/ABMIL checkpoint → (module, params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return CLAM(cfg), convert_clam_checkpoint(sd, cfg)
