"""torchvision ResNet-50 converter parity (the CLAM-legacy patch encoder).

Oracle: a torch re-statement of the reference's truncated trunk
(``resnet50_baseline``, ``/root/reference/models/resnet_custom.py:21-127``
— blocks 1-3 of the standard torchvision layout + adaptive avg pool),
run in eval mode on randomly initialized weights with random BN running
stats. The converter re-lays the exact torchvision ``state_dict`` key
schema (including ``layer4``/``fc`` keys that must be ignored, matching
the reference's ``strict=False`` load).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from moc_tpu.models.convert_resnet import convert_resnet50
from moc_tpu.nn.resnet import ResNet50Trunk


class _Bottleneck(tnn.Module):
    # ref resnet_custom.py:21-57 (Bottleneck_Baseline)
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class _Trunk(tnn.Module):
    # ref resnet_custom.py:60-113 (ResNet_Baseline, layers [3, 4, 6])
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make(64, 3)
        self.layer2 = self._make(128, 4, stride=2)
        self.layer3 = self._make(256, 6, stride=2)

    def _make(self, planes, blocks, stride=1):
        down = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer3(self.layer2(self.layer1(x)))
        return x.mean(dim=(2, 3))  # adaptive avg pool (1) + flatten


@pytest.fixture(scope="module")
def torch_trunk():
    torch.manual_seed(0)
    m = _Trunk()
    # random running stats so eval-mode BN actually exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0.0, 0.2)
    return m.eval()


def test_convert_resnet50_parity(torch_trunk):
    sd = {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    # torchvision checkpoints also carry layer4 + fc: must be ignored
    # (ref resnet_custom.py:126: load_state_dict(..., strict=False))
    sd["layer4.0.conv1.weight"] = np.zeros((512, 1024, 1, 1), np.float32)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    variables = convert_resnet50(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_trunk(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ResNet50Trunk().apply(variables, x))
    assert got.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_load_resnet50_file_and_extract_cli(torch_trunk, tmp_path):
    """torch.save → load_resnet50 → cli.extract_features --backbone resnet50
    writes CLAM-schema 1024-d bags (raw, un-normalized — the CLAM-legacy
    feature protocol)."""
    import h5py

    from moc_tpu.cli.extract_features import main as ex_main

    ckpt = str(tmp_path / "resnet50.pth")
    torch.save({"state_dict": torch_trunk.state_dict()}, ckpt)

    rng = np.random.default_rng(1)
    bags = tmp_path / "patches" / "h5_files"
    bags.mkdir(parents=True)
    imgs = rng.integers(0, 255, size=(7, 64, 64, 3)).astype(np.uint8)
    coords = np.stack([np.arange(7) * 64, np.zeros(7)], axis=1).astype(np.int64)
    with h5py.File(bags / "s.h5", "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("coords", data=coords)

    out = tmp_path / "feats"
    rc = ex_main(["--patch_dir", str(tmp_path / "patches"),
                  "--out_dir", str(out), "--backbone", "resnet50",
                  "--checkpoint", ckpt, "--image_size", "64",
                  "--batch_size", "4", "--platform", "cpu"])
    assert rc == 0
    with h5py.File(out / "h5_files" / "s.h5", "r") as f:
        feats = f["features"][:]
    assert feats.shape == (7, 1024)
    norms = np.linalg.norm(feats, axis=1)
    assert not np.allclose(norms, 1.0, atol=1e-3)  # raw, not L2-normalized

    # parity of the CLI-produced features vs the torch oracle on the same
    # preprocessed pixels (ImageNet transform)
    from moc_tpu.zeroshot.transform import preprocess_image_imagenet

    pre = np.stack([preprocess_image_imagenet(im, 64) for im in imgs])
    with torch.no_grad():
        want = torch_trunk(
            torch.from_numpy(pre.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(feats, want, rtol=2e-4, atol=2e-4)
