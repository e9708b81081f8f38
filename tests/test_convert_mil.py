"""Torch CLAM checkpoint conversion: a torch re-statement of the reference
forward (model_clam.py:77-326) serves as the oracle — converted flax params
must reproduce its slide logits exactly."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from moc_tpu.models.clam import CLAM, ClamConfig
from moc_tpu.models.convert_mil import (
    clean_torch_state_dict,
    convert_clam_checkpoint,
)

D, HID, AH = 512, 512, 384  # size_arg="conch"


class TorchGatedAttn(nn.Module):
    """Reference Attn_Net_Gated layout (model_clam.py:41-64)."""

    def __init__(self, n_out):
        super().__init__()
        self.attention_a = nn.Sequential(nn.Linear(HID, AH), nn.Tanh())
        self.attention_b = nn.Sequential(nn.Linear(HID, AH), nn.Sigmoid())
        self.attention_c = nn.Linear(AH, n_out)

    def forward(self, x):
        return self.attention_c(self.attention_a(x) * self.attention_b(x))


class TorchClamSB(nn.Module):
    def __init__(self, n_classes=2):
        super().__init__()
        self.attention_net = nn.Sequential(
            nn.Linear(D, HID), nn.ReLU(), TorchGatedAttn(1))
        self.classifiers = nn.Linear(HID, n_classes)
        self.instance_classifiers = nn.ModuleList(
            [nn.Linear(HID, 2) for _ in range(n_classes)])
        self.instance_loss_fn = nn.CrossEntropyLoss()

    def forward(self, x):
        h = F.relu(self.attention_net[0](x))
        a = self.attention_net[2](h).T  # [1, N]
        w = F.softmax(a, dim=1)
        return self.classifiers((w @ h)[0])


class TorchClamMB(nn.Module):
    def __init__(self, n_classes=3):
        super().__init__()
        self.attention_net = nn.Sequential(
            nn.Linear(D, HID), nn.ReLU(), TorchGatedAttn(n_classes))
        self.classifiers = nn.ModuleList(
            [nn.Linear(HID, 1) for _ in range(n_classes)])
        self.instance_classifiers = nn.ModuleList(
            [nn.Linear(HID, 2) for _ in range(n_classes)])

    def forward(self, x):
        h = F.relu(self.attention_net[0](x))
        a = self.attention_net[2](h).T  # [C, N]
        w = F.softmax(a, dim=1)
        m = w @ h  # [C, HID]
        return torch.cat([clf(m[c]) for c, clf in enumerate(self.classifiers)])


@pytest.mark.parametrize("multi_branch", [False, True])
def test_converted_clam_matches_torch_oracle(multi_branch):
    torch.manual_seed(0)
    c = 3 if multi_branch else 2
    tmodel = TorchClamMB(c) if multi_branch else TorchClamSB(c)
    tmodel.eval()

    cfg = ClamConfig(n_classes=c, size_arg="conch", multi_branch=multi_branch)
    params = convert_clam_checkpoint(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(0)
    n, pad = 100, 128
    feats = rng.normal(size=(pad, D)).astype(np.float32)
    feats[n:] = 0.0
    valid = np.arange(pad) < n

    with torch.no_grad():
        want = tmodel(torch.from_numpy(feats[:n])).numpy()
    out = CLAM(cfg).apply(params, jnp.asarray(feats), jnp.asarray(valid), None)
    np.testing.assert_allclose(np.asarray(out["logits"]), want, atol=2e-5)
    # patch-level logits too (ref forward_patch_level)
    assert out["patch_logits"].shape == (pad, c)


def test_clean_strips_module_and_instance_loss():
    sd = {"a.module.w": 1, "instance_loss_fn.weight": 2, "b": 3}
    got = clean_torch_state_dict(sd)
    assert got == {"a.w": 1, "b": 3}


def test_dropout_checkpoint_index_resolved():
    """With dropout the gated attn sits at Sequential index 3."""
    torch.manual_seed(1)
    t = TorchClamSB(2)
    sd = {k.replace("attention_net.2.", "attention_net.3."): v
          for k, v in t.state_dict().items()}
    cfg = ClamConfig(n_classes=2, size_arg="conch")
    params = convert_clam_checkpoint(sd, cfg)
    assert params["params"]["attn"]["fc_a"]["kernel"].shape == (HID, AH)
