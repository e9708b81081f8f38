"""Adapter-zoo parity against the reference torch modules.

Drives the reference CLIP/Tip/MoE/AMU adapters and the uncertainty
weightings (``models/model_adapters.py``) with random init and compares the
flax ``moc_tpu.models.adapters`` on re-laid weights. ``openslide`` and the
CONCH loader chain are stubbed (the adapters' forward paths never touch
them). Skipped without ``/root/reference``.
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

N, D, C = 60, 64, 3


@pytest.fixture(scope="module")
def ref_ada():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for name in ("openslide",):
        sys.modules.setdefault(name, types.ModuleType(name))
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    mc = types.ModuleType("models.model_conch")
    mc.conch_lora = None
    sys.modules.setdefault("models.model_conch", mc)
    ensure_spec("openslide", "torchvision", "torchvision.transforms",
                "models.model_conch")
    from models import model_adapters as ma

    return ma


def _feats(seed=0, n=N, d=D):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


def _classifier(seed=1, d=D, c=C):
    return np.random.default_rng(seed).normal(size=(d, c)).astype(np.float32)


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


@pytest.mark.parametrize("kind", ["entropy", "energy", "max", "max-min",
                                  "var", "top5", "moment", "none"])
def test_uncertainty_parity(ref_ada, kind):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import uncertainty

    logits = _feats(3, 40, 8)
    with torch.no_grad():
        want = ref_ada.uncertainty(torch.from_numpy(logits), kind, 0.7)
    got = np.asarray(uncertainty(jnp.asarray(logits), kind, 0.7))
    np.testing.assert_allclose(np.broadcast_to(got, got.shape),
                               np.broadcast_to(want.numpy(), got.shape),
                               rtol=2e-4, atol=1e-5)


def test_linear_adapter_init_parity(ref_ada):
    from moc_tpu.models.adapters import linear_adapter_init

    rng = np.random.default_rng(4)
    aux_feats = rng.normal(size=(12, D)).astype(np.float32)
    aux_labels = rng.integers(0, C, size=12)
    torch.manual_seed(0)
    ref = ref_ada.Linear_Adapter(D, C, (torch.from_numpy(aux_feats),
                                        torch.from_numpy(aux_labels)))
    want = ref.fc.weight.detach().numpy().T  # [D, C]
    got = linear_adapter_init(aux_feats, aux_labels, C, D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_clip_adapter_parity(ref_ada):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import AdapterConfig, ClipAdapter

    w = _classifier()
    torch.manual_seed(1)
    ref = ref_ada.Conch_CLIP_Ada(c_in=D, reduction=4, num_classes=C,
                                 classifier_tensor=torch.from_numpy(w),
                                 clip_ratio=0.2, topj=7).eval()
    sd = _sd(ref)
    params = {"params": {"adapter": {
        "down": {"kernel": sd["adapter.0.weight"].T},
        "up": {"kernel": sd["adapter.2.weight"].T}}}}
    feats = _feats(5)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats)).numpy()[0]
    got = ClipAdapter(AdapterConfig(c_in=D, n_classes=C, clip_ratio=0.2,
                                    topj=7)).apply(
        params, jnp.asarray(feats), jnp.ones(N, bool), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_tip_adapter_parity(ref_ada):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import (AdapterConfig, TipAdapter,
                                         linear_adapter_init)

    w = _classifier()
    rng = np.random.default_rng(6)
    aux_feats = rng.normal(size=(9, D)).astype(np.float32)
    aux_labels = rng.integers(0, C, size=9)
    torch.manual_seed(2)
    ref = ref_ada.Conch_TIP_Ada(
        c_in=D, num_classes=C, classifier_tensor=torch.from_numpy(w),
        sample_features=(torch.from_numpy(aux_feats),
                         torch.from_numpy(aux_labels)),
        clip_ratio=0.15).eval()
    cache = linear_adapter_init(aux_feats, aux_labels, C, D)
    feats = _feats(7)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats.copy())).numpy()[0]
    model = TipAdapter(AdapterConfig(c_in=D, n_classes=C, clip_ratio=0.15,
                                     topj=10), cache_init=tuple(map(tuple, cache)))
    params = model.init(__import__("jax").random.PRNGKey(0),
                        jnp.asarray(feats), jnp.ones(N, bool), jnp.asarray(w))
    got = model.apply(params, jnp.asarray(feats), jnp.ones(N, bool),
                      jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _moe_params(sd, e, d, r):
    down = np.stack([sd[f"adapter_{i}.0.weight"].T for i in range(e)], axis=1)
    up = np.stack([sd[f"adapter_{i}.2.weight"].T for i in range(e)], axis=1)
    return {"params": {
        "gate": {"kernel": sd["ada_router.gate.weight"].T},
        "experts_down": down.reshape(d, e * r),
        "experts_up": up.reshape(r, e * d),
    }}


@pytest.mark.parametrize("switch,balance", [(False, False), (True, False),
                                            (True, True)])
def test_moe_adapter_parity(ref_ada, switch, balance):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import AdapterConfig, MoEClipAdapter

    w = _classifier()
    e, r = 4, D // 4
    torch.manual_seed(3)
    ref = ref_ada.Conch_MOE_CLIP_Ada(
        c_in=D, reduction=4, ada_num=e, topj=6,
        classifier_tensor=torch.from_numpy(w), clip_ratio=0.3,
        use_switch_gate=switch, use_balance_loss=balance).eval()
    params = _moe_params(_sd(ref), e, D, r)
    feats = _feats(8)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats.copy()))
    model = MoEClipAdapter(AdapterConfig(c_in=D, n_classes=C, clip_ratio=0.3,
                                         topj=6), n_experts=e,
                           use_switch_gate=switch, use_balance_loss=balance)
    got = model.apply(params, jnp.asarray(feats), jnp.ones(N, bool),
                      jnp.asarray(w))
    if balance:
        want, want_loss = want
        got, got_loss = got
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want.numpy()[0], rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("kind", ["none", "entropy", "max"])
def test_amu_vanilla_parity(ref_ada, kind):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import AdapterConfig, AMUAdapter

    w = _classifier()
    d_aux = 48
    torch.manual_seed(4)
    ref = ref_ada.Conch_AMUVanilla_Ada(
        c_in=D, c_in_aux=d_aux, reduction=4, num_classes=C,
        classifier_tensor=torch.from_numpy(w), clip_ratio=0.2, aux_ratio=0.1,
        uncertainty_type=kind, uncertainty_power=0.5).eval()
    sd = _sd(ref)
    params = {"params": {
        "adapter": {"down": {"kernel": sd["adapter.0.weight"].T},
                    "up": {"kernel": sd["adapter.2.weight"].T}},
        "aux_kernel": sd["aux_adapter.fc.weight"].T,
    }}
    feats = _feats(9)
    aux = np.random.default_rng(10).normal(size=(N, d_aux)).astype(np.float32)
    with torch.no_grad():
        want, want_aux = ref(torch.from_numpy(feats.copy()),
                             torch.from_numpy(aux.copy()))
    model = AMUAdapter(AdapterConfig(c_in=D, n_classes=C, clip_ratio=0.2),
                       c_in_aux=d_aux, aux_ratio=0.1, uncertainty_type=kind,
                       uncertainty_power=0.5)
    got, got_aux = model.apply(params, jnp.asarray(feats), jnp.ones(N, bool),
                               jnp.asarray(aux), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want.numpy()[0], rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_aux), want_aux.numpy()[0],
                               rtol=2e-4, atol=1e-5)


def test_amu_tip_parity(ref_ada):
    import jax.numpy as jnp

    from moc_tpu.models.adapters import (AdapterConfig, AMUAdapter,
                                         linear_adapter_init)

    w = _classifier()
    d_aux = 48
    rng = np.random.default_rng(11)
    main_f = rng.normal(size=(9, D)).astype(np.float32)
    main_l = rng.integers(0, C, size=9)
    aux_f = rng.normal(size=(9, d_aux)).astype(np.float32)
    aux_l = main_l
    torch.manual_seed(5)
    ref = ref_ada.Conch_AMUTip_Ada(
        c_in=D, c_in_aux=d_aux, num_classes=C,
        classifier_tensor=torch.from_numpy(w),
        sample_features=(torch.from_numpy(main_f), torch.from_numpy(main_l)),
        aux_sample_features=(torch.from_numpy(aux_f), torch.from_numpy(aux_l)),
        clip_ratio=0.2, aux_ratio=0.1).eval()
    feats = _feats(12)
    aux = np.random.default_rng(13).normal(size=(N, d_aux)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats.copy()),
                   torch.from_numpy(aux.copy())).numpy()[0]
    model = AMUAdapter(
        AdapterConfig(c_in=D, n_classes=C, clip_ratio=0.2), c_in_aux=d_aux,
        aux_ratio=0.1, uncertainty_type="none", main_adapter="linear",
        main_cache_init=tuple(map(tuple, linear_adapter_init(main_f, main_l, C, D))),
        aux_cache_init=tuple(map(tuple, linear_adapter_init(aux_f, aux_l, C, d_aux))))
    import jax

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.ones(N, bool), jnp.asarray(aux), jnp.asarray(w))
    got, _ = model.apply(params, jnp.asarray(feats), jnp.ones(N, bool),
                         jnp.asarray(aux), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)
