"""Tests for the MIL model zoo: shapes, masking invariants, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.models import (
    CHIEF,
    CLAM,
    ChiefConfig,
    ClamConfig,
    MILFc,
    MILFcMC,
    MilFcConfig,
    TransMIL,
    TransMILConfig,
    clam_mb,
    clam_sb,
)


def _bag(seed, n=256, n_valid=200, d=512):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats[n_valid:] = 0.0
    valid = np.arange(n) < n_valid
    return jnp.asarray(feats), jnp.asarray(valid)


def _pad_double(feats, valid):
    z = jnp.zeros_like(feats)
    return jnp.concatenate([feats, z]), jnp.concatenate([valid, jnp.zeros_like(valid)])


@pytest.mark.parametrize("multi_branch", [False, True])
def test_clam_shapes_and_pad_invariance(multi_branch):
    feats, valid = _bag(0)
    model = CLAM(ClamConfig(n_classes=3, size_arg="conch", multi_branch=multi_branch))
    params = model.init(jax.random.PRNGKey(0), feats, valid)
    out = model.apply(params, feats, valid)
    assert out["logits"].shape == (3,)
    n_branch = 3 if multi_branch else 1
    assert out["attention"].shape == (n_branch, 256)
    # attention weights are zero on pads
    assert float(jnp.abs(out["attention_weights"][:, 200:]).max()) == 0.0
    # doubling the padding changes nothing
    f2, v2 = _pad_double(feats, valid)
    out2 = model.apply(params, f2, v2)
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]),
                               rtol=1e-5, atol=1e-6)


def test_clam_instance_loss_and_grads():
    feats, valid = _bag(1)
    model = clam_sb(2, "conch", subtyping=False)
    params = model.init(jax.random.PRNGKey(0), feats, valid, 0, instance_eval=True)

    def loss(p):
        out = model.apply(p, feats, valid, jnp.int32(1), instance_eval=True)
        return out["logits"][1] * 0.7 + out["instance_loss"]

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # instance classifiers must receive gradient
    g_inst = grads["params"]["instance_classifiers"]["kernel"]
    assert float(jnp.abs(g_inst).sum()) > 0


def test_clam_mb_branch_heads_differ():
    feats, valid = _bag(2)
    model = clam_mb(3, "conch")
    params = model.init(jax.random.PRNGKey(1), feats, valid)
    out = model.apply(params, feats, valid)
    # three attention branches should not be identical at random init
    a = np.asarray(out["attention"])
    assert not np.allclose(a[0], a[1])


def test_milfc_binary():
    feats, valid = _bag(3)
    model = MILFc(MilFcConfig(n_classes=2, size_arg="conch"))
    params = model.init(jax.random.PRNGKey(0), feats, valid)
    out = model.apply(params, feats, valid)
    assert out["logits"].shape == (2,)
    assert int(out["top_idx"]) < 200  # never selects a padded patch
    f2, v2 = _pad_double(feats, valid)
    out2 = model.apply(params, f2, v2)
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]),
                               rtol=1e-5)


def test_milfc_mc():
    feats, valid = _bag(4)
    model = MILFcMC(MilFcConfig(n_classes=4, size_arg="conch"))
    params = model.init(jax.random.PRNGKey(0), feats, valid)
    out = model.apply(params, feats, valid)
    assert out["logits"].shape == (4,)
    assert int(out["top_idx"]) < 200
    assert 0 <= int(out["y_hat"]) < 4


@pytest.mark.slow
def test_transmil_forward():
    feats, valid = _bag(5, n=256, n_valid=180)
    model = TransMIL(TransMILConfig(n_classes=2, size_arg="conch"))
    params = model.init(jax.random.PRNGKey(0), feats, valid)
    out = model.apply(params, feats, valid)
    assert out["logits"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(out["logits"])))

    def loss(p):
        return model.apply(p, feats, valid)["logits"][0]

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_transmil_conv_impls_identical():
    """The grouped-conv forward (inference default) and the shifted-slice
    formulation (fused-trainer ``grad_friendly`` path) are the same math —
    values AND gradients must agree on the same params."""
    feats, valid = _bag(9, n=256, n_valid=200)
    conv = TransMIL(TransMILConfig(n_classes=2, conv_impl="conv"))
    slices = TransMIL(TransMILConfig(n_classes=2, conv_impl="slices"))
    params = conv.init(jax.random.PRNGKey(0), feats, valid)
    out_c = conv.apply(params, feats, valid)
    out_s = slices.apply(params, feats, valid)
    for k in ("logits", "patch_logits"):
        np.testing.assert_allclose(np.asarray(out_c[k]), np.asarray(out_s[k]),
                                   rtol=1e-5, atol=1e-5)
    g_c = jax.grad(lambda p: conv.apply(p, feats, valid)["logits"][0])(params)
    g_s = jax.grad(lambda p: slices.apply(p, feats, valid)["logits"][0])(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        g_c, g_s)


def test_transmil_vmap_batch():
    model = TransMIL(TransMILConfig(n_classes=2, size_arg="conch"))
    f0, v0 = _bag(6, n=256, n_valid=100)
    f1, v1 = _bag(7, n=256, n_valid=256)
    params = model.init(jax.random.PRNGKey(0), f0, v0)
    batched = jax.vmap(lambda f, v: model.apply(params, f, v)["logits"])
    out = batched(jnp.stack([f0, f1]), jnp.stack([v0, v1]))
    assert out.shape == (2, 2)
    single = model.apply(params, f0, v0)["logits"]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), rtol=1e-5, atol=1e-5)


def test_chief_forward_and_patch_probs():
    feats, valid = _bag(8, d=512)
    model = CHIEF(ChiefConfig(n_classes=2, size_arg="conch", dropout=0.0))
    params = model.init(jax.random.PRNGKey(0), feats, valid, 3)
    out = model.apply(params, feats, valid, 3)
    assert out["logits"].shape == (2,)
    # different anatomical sites shift the logits
    out2 = model.apply(params, feats, valid, 7)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))
    pp = model.apply(params, feats, valid, 3, method=CHIEF.patch_probs)
    assert pp["patch_prob"].shape == (256,)
    assert float(pp["patch_prob"][200:].max()) == 0.0  # pads zeroed
    np.testing.assert_allclose(float(jnp.sum(pp["bag_prob"])), 1.0, rtol=1e-5)
