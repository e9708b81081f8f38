"""MIL-fc and CHIEF parity against the reference torch models.

Instantiates the reference ``MIL_fc``/``MIL_fc_mc`` (``models/model_mil.py:
11-101``) and ``CHIEF`` (``models/model_chief.py:82-195``) with random init
and compares the flax heads on re-laid weights. The reference file imports
``nystrom_attention`` (unused by MIL_fc) and CHIEF hard-loads its site
embedding from a user path — both stubbed. Skipped without
``/root/reference``.
"""

import os
import sys

from tests._stub_spec import ensure_spec
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models"))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")


@pytest.fixture(scope="module")
def ref_models(monkeypatch_module=None):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "nystrom_attention" not in sys.modules:
        stub = types.ModuleType("nystrom_attention")

        class NystromAttention:  # imported but unused by MIL_fc/MIL_fc_mc
            def __init__(self, *a, **k):
                raise NotImplementedError

        stub.NystromAttention = NystromAttention
        sys.modules["nystrom_attention"] = stub
    if "torchvision" not in sys.modules:  # utils.utils imports transforms only
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        ensure_spec("nystrom_attention", "torchvision", "torchvision.transforms")
    from models import model_mil

    from models import model_chief

    torch.manual_seed(99)
    site_table = torch.randn(19, 768)
    return model_mil, model_chief, site_table.numpy()


def _make_chief(model_chief, site_np, **kw):
    """CHIEF.__init__ torch.load()s a hard-coded user path for the site
    embedding table — substitute the fixture table during construction."""
    real_load = torch.load
    torch.load = lambda *a, **k: torch.from_numpy(site_np)
    try:
        return model_chief.CHIEF(**kw).eval()
    finally:
        torch.load = real_load


def _dense(sd, p):
    return {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_mil_fc_parity(ref_models):
    import jax.numpy as jnp

    from moc_tpu.models.mil import MILFc, MilFcConfig

    model_mil, _, _ = ref_models
    torch.manual_seed(0)
    ref = model_mil.MIL_fc(size_arg="small", dropout=False, n_classes=2).eval()
    sd = _sd(ref)
    params = {"params": {"fc": _dense(sd, "classifier.0"),
                         "classifier": _dense(sd, "classifier.2")}}
    feats = np.random.default_rng(0).normal(size=(37, 1024)).astype(np.float32)
    with torch.no_grad():
        top, y_prob, y_hat, y_probs, _ = ref(torch.from_numpy(feats))
    out = MILFc(MilFcConfig(size_arg="small")).apply(
        params, jnp.asarray(feats), jnp.ones(37, bool))
    np.testing.assert_allclose(np.asarray(out["logits"]), top.numpy()[0],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["patch_probs"]), y_probs.numpy(),
                               atol=1e-5, rtol=1e-5)
    assert int(jnp.argmax(out["logits"])) == int(y_hat)


def test_mil_fc_mc_parity(ref_models):
    import jax.numpy as jnp

    from moc_tpu.models.mil import MILFcMC, MilFcConfig

    model_mil, _, _ = ref_models
    torch.manual_seed(1)
    ref = model_mil.MIL_fc_mc(size_arg="small", dropout=False, n_classes=3).eval()
    sd = _sd(ref)
    kernel = np.stack([sd[f"classifiers.{c}.weight"].T for c in range(3)])
    bias = np.stack([sd[f"classifiers.{c}.bias"] for c in range(3)])
    params = {"params": {"fc": _dense(sd, "fc.0"),
                         "classifiers": {"kernel": kernel, "bias": bias}}}
    feats = np.random.default_rng(1).normal(size=(29, 1024)).astype(np.float32)
    with torch.no_grad():
        top, y_prob, y_hat, y_probs, _ = ref(torch.from_numpy(feats))
    out = MILFcMC(MilFcConfig(size_arg="small", n_classes=3)).apply(
        params, jnp.asarray(feats), jnp.ones(29, bool))
    np.testing.assert_allclose(np.asarray(out["logits"]), top.numpy()[0],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["patch_probs"]), y_probs.numpy(),
                               atol=1e-5, rtol=1e-5)
    assert int(out["y_hat"]) == int(y_hat)


def _chief_params(sd, gate, dropout):
    attn_at = 3 if dropout else 2
    if gate:
        attn = {"fc_a": _dense(sd, f"attention_net.{attn_at}.attention_a.0"),
                "fc_b": _dense(sd, f"attention_net.{attn_at}.attention_b.0"),
                "score": _dense(sd, f"attention_net.{attn_at}.attention_c")}
    else:
        attn = {"fc": _dense(sd, f"attention_net.{attn_at}.module.0"),
                "score": _dense(sd, f"attention_net.{attn_at}.module.3")}
    return {"params": {
        "fc": _dense(sd, "attention_net.0"),
        "attn": attn,
        "text_to_vision": _dense(sd, "text_to_vision.0"),
        "classifiers": _dense(sd, "classifiers"),
    }}


@pytest.mark.parametrize("gate", [True, False])
def test_chief_parity(ref_models, gate):
    import jax.numpy as jnp

    from moc_tpu.models.chief import CHIEF, ChiefConfig

    _, model_chief, site = ref_models
    torch.manual_seed(2)
    ref = _make_chief(model_chief, site, gate=gate, size_arg="small",
                      dropout=True, n_classes=2)
    sd = _sd(ref)
    params = _chief_params(sd, gate, dropout=True)
    feats = np.random.default_rng(2).normal(size=(41, 768)).astype(np.float32)
    anatomic = 7
    with torch.no_grad():
        logits, y_prob, y_hat, a_raw, result = ref(
            torch.from_numpy(feats), torch.tensor([anatomic]))
    model = CHIEF(ChiefConfig(size_arg="small", gate=gate, dropout=0.25),
                  site_embeddings=tuple(map(tuple, site)))
    out = model.apply(params, jnp.asarray(feats), jnp.ones(41, bool), anatomic)
    np.testing.assert_allclose(np.asarray(out["logits"]), logits.numpy()[0],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["wsi_feature_anatomical"]),
        result["WSI_feature_anatomical"].numpy()[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["attention"]),
                               a_raw.numpy(), atol=2e-5, rtol=1e-4)


def test_chief_patch_probs_parity(ref_models):
    import jax.numpy as jnp

    from moc_tpu.models.chief import CHIEF, ChiefConfig

    _, model_chief, site = ref_models
    torch.manual_seed(3)
    ref = _make_chief(model_chief, site, gate=True, size_arg="small",
                      dropout=True, n_classes=2)
    sd = _sd(ref)
    params = _chief_params(sd, gate=True, dropout=True)
    feats = np.random.default_rng(3).normal(size=(23, 768)).astype(np.float32)
    with torch.no_grad():
        want = ref.patch_probs(torch.from_numpy(feats), torch.tensor([0]))
    model = CHIEF(ChiefConfig(size_arg="small", gate=True, dropout=0.25),
                  site_embeddings=tuple(map(tuple, site)))
    got = model.apply(params, jnp.asarray(feats), jnp.ones(23, bool), 0,
                      method=CHIEF.patch_probs)
    np.testing.assert_allclose(np.asarray(got["bag_prob"]),
                               want["bag_prob"].numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["patch_prob"]),
                               want["patch_prob"].numpy(), atol=2e-5,
                               rtol=1e-4)
