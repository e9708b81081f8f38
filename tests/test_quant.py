"""int8-resident serving tier: quantization ops + MOC forward routing.

The reference serves f32 only (no serving path at all, in fact:
``/root/reference/main_moc.py:462-520`` re-runs eval loops per cohort).
The int8 tier is a moc_tpu-only capability; these tests pin its contract:
per-row symmetric quantization, exact W8A8 integer accumulation, masked-path
routing, and end-to-end agreement with the f32 forward within quantization
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.data.batching import pack_bags
from moc_tpu.data.bags import Bag
from moc_tpu.moc import MOCConfig, init_senet, make_episode_fns, moc_slide_logits
from moc_tpu.models.senet import SENet
from moc_tpu.ops import (
    dequantize_rows,
    int8_row_matmul,
    quantize_columns,
    quantize_rows_device,
    quantize_rows_host,
)


def _rand_bag(rng, n, n_valid, d):
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats[n_valid:] = 0.0
    valid = np.zeros((n,), bool)
    valid[:n_valid] = True
    return feats, valid


def test_quantize_rows_roundtrip_bound():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(64, 32)).astype(np.float32) * rng.uniform(
        0.01, 100.0, size=(64, 1)).astype(np.float32)  # wild per-row ranges
    q, s = quantize_rows_host(f)
    assert q.dtype == np.int8 and s.dtype == np.float32 and s.shape == (64,)
    deq = q.astype(np.float32) * s[:, None]
    # symmetric absmax/127: error per element is at most half a step
    np.testing.assert_allclose(deq, f, atol=float(np.max(s)) / 2 + 1e-7)


def test_quantize_rows_device_matches_host():
    """The jit-safe device quantizer mirrors the pack-time host kernel
    (absmax/127, f32 arithmetic, zero rows → scale 0) — exact on the CPU
    backend, including padded all-zero rows and wild per-row ranges."""
    rng = np.random.default_rng(1)
    f = rng.normal(size=(48, 40)).astype(np.float32) * rng.uniform(
        0.01, 100.0, size=(48, 1)).astype(np.float32)
    f[-5:] = 0.0  # bag padding rows
    qh, sh = quantize_rows_host(f)
    qd, sd = jax.jit(quantize_rows_device)(jnp.asarray(f))
    # int8 codes match exactly; scales may sit 1 ulp off the native host
    # kernel (it folds the /127 differently) — measured 1.1e-7 max rel
    np.testing.assert_array_equal(np.asarray(qd), qh)
    np.testing.assert_allclose(np.asarray(sd), sh, rtol=3e-7)
    assert np.asarray(sd)[-5:].tolist() == [0.0] * 5


def test_quantize_rows_zero_rows_stay_zero():
    f = np.zeros((4, 8), np.float32)
    f[1] = 3.0
    q, s = quantize_rows_host(f)
    assert s[0] == 0.0 and s[2] == 0.0 and (q[0] == 0).all()
    np.testing.assert_allclose(q[1].astype(np.float32) * s[1], f[1], atol=s[1] / 2)


def test_int8_row_matmul_matches_numpy_reference():
    """The device matmul is exactly dequant(q) @ dequant(wq): the int32
    accumulation is exact, so a numpy re-statement must match bitwise-ish."""
    rng = np.random.default_rng(1)
    f = rng.normal(size=(48, 24)).astype(np.float32)
    w = rng.normal(size=(24, 5)).astype(np.float32)
    q, s = quantize_rows_host(f)
    wq, s_col = jax.device_get(quantize_columns(jnp.asarray(w)))
    want = (q.astype(np.int64) @ wq.astype(np.int64)).astype(np.float32)
    want = want * s[:, None] * s_col[None, :]
    got = np.asarray(int8_row_matmul(jnp.asarray(q), jnp.asarray(s), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_native_quantizer_matches_numpy():
    """The C++ single-pass quantizer is bit-identical to the all-f32 numpy
    formulation (same rounding mode, same f32 arithmetic), incl. zero rows
    and adversarial near-tie values."""
    from moc_tpu.data.native import native_available, quantize_rows_i8

    if not native_available():
        pytest.skip("native lib unavailable (no compiler)")
    rng = np.random.default_rng(7)
    f = rng.normal(size=(96, 64)).astype(np.float32) * rng.uniform(
        1e-3, 1e3, size=(96, 1)).astype(np.float32)
    f[10] = 0.0
    # adversarial: values that land exactly on quantization-grid midpoints
    f[11] = np.linspace(-1, 1, 64, dtype=np.float32)
    f[11, 0] = 1.0  # absmax 1 -> scale 1/127; many near-.5 products
    native = quantize_rows_i8(np.ascontiguousarray(f))
    assert native is not None
    q_n, s_n = native

    # numpy fallback (force it by bypassing the dispatch)
    absmax = np.max(np.abs(f), axis=-1)
    scales = absmax.astype(np.float32) / np.float32(127.0)
    inv = np.float32(1.0) / np.where(scales > 0, scales, np.float32(1.0))
    inv = np.where(scales > 0, inv.astype(np.float32), np.float32(0.0))
    q = np.clip(np.rint(f * inv[..., None]), -127, 127).astype(np.int8)

    np.testing.assert_array_equal(s_n, scales)
    np.testing.assert_array_equal(q_n, q)

    # 3D (batched) inputs flatten to rows
    f3 = rng.normal(size=(3, 17, 32)).astype(np.float32)
    q3, s3 = quantize_rows_i8(np.ascontiguousarray(f3))
    q2, s2 = quantize_rows_i8(np.ascontiguousarray(f3.reshape(-1, 32)))
    np.testing.assert_array_equal(q3.reshape(-1, 32), q2)
    np.testing.assert_array_equal(s3.ravel(), s2)


def test_dequantize_rows():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(16, 8)).astype(np.float32)
    q, s = quantize_rows_host(f)
    got = np.asarray(dequantize_rows(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(got, q.astype(np.float32) * s[:, None])


def _episode_cfg(d, topj=16, **kw):
    return MOCConfig(n_classes=2, n_ext_classes=6, feature_dim=d, topj=topj,
                     topk=8, **kw)


def test_int8_tier_exact_when_grid_aligned():
    """Features and weights already on the int8 grid (integers in [-127,127]
    with absmax exactly 127 per row/col -> scales exactly 1): the tier must
    reproduce the f32 forward to float tolerance — quantization is the ONLY
    error source."""
    rng = np.random.default_rng(3)
    d, n = 32, 256
    f = rng.integers(-127, 128, size=(n, d)).astype(np.float32)
    f[:, 0] = 127  # pin every row's absmax to exactly 127
    f[200:] = 0.0
    valid = np.zeros((n,), bool)
    valid[:200] = True
    w = rng.integers(-127, 128, size=(d, 2)).astype(np.float32)
    w_ext = rng.integers(-127, 128, size=(d, 6)).astype(np.float32)
    w[0, :] = 127
    w_ext[0, :] = 127

    cfg = _episode_cfg(d)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    apply = SENet(in_dim=d, out_dim=4).apply
    # the fused-senet column block must be grid-aligned too: replace the
    # trained kernel with integer values (absmax 127 per column)
    k0 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (d, 64), -127, 128),
        np.float32)
    k0[0, :] = 127
    params = jax.tree.map(lambda x: x, params)
    params["params"]["Dense_0"]["kernel"] = jnp.asarray(k0)

    q, s = quantize_rows_host(f)
    np.testing.assert_array_equal(q.astype(np.float32) * s[:, None], f)

    exact = moc_slide_logits(apply, params, jnp.asarray(f), jnp.asarray(valid),
                             jnp.asarray(w), jnp.asarray(w_ext), cfg, None)
    tier = moc_slide_logits(apply, params, jnp.asarray(q), jnp.asarray(valid),
                            jnp.asarray(w), jnp.asarray(w_ext), cfg, None,
                            scales=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(tier), np.asarray(exact),
                               rtol=1e-5, atol=1e-4)


def test_int8_tier_tracks_f32_forward():
    """Random features: the int8 forward stays within quantization noise of
    the f32 path (same tolerance class as the bf16-resident test)."""
    rng = np.random.default_rng(4)
    d = 32
    feats, valid = _rand_bag(rng, 256, 200, d)
    w = rng.normal(size=(d, 2)).astype(np.float32)
    w_ext = rng.normal(size=(d, 6)).astype(np.float32)
    cfg = _episode_cfg(d)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    apply = SENet(in_dim=d, out_dim=4).apply

    q, s = quantize_rows_host(feats)
    exact = moc_slide_logits(apply, params, jnp.asarray(feats),
                             jnp.asarray(valid), jnp.asarray(w),
                             jnp.asarray(w_ext), cfg, None)
    tier = moc_slide_logits(apply, params, jnp.asarray(q), jnp.asarray(valid),
                            jnp.asarray(w), jnp.asarray(w_ext), cfg, None,
                            scales=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(tier), np.asarray(exact),
                               rtol=5e-2, atol=5e-2)


def test_int8_tier_rejects_training():
    rng = np.random.default_rng(5)
    d = 16
    feats, valid = _rand_bag(rng, 64, 50, d)
    q, s = quantize_rows_host(feats)
    cfg = _episode_cfg(d, topj=8)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    apply = SENet(in_dim=d, out_dim=4).apply
    with pytest.raises(ValueError, match="serving tier"):
        moc_slide_logits(apply, params, jnp.asarray(q), jnp.asarray(valid),
                         jnp.asarray(np.eye(d, 2, dtype=np.float32)),
                         jnp.asarray(np.eye(d, 6, dtype=np.float32)), cfg,
                         jax.random.PRNGKey(0), scales=jnp.asarray(s))


def test_pack_bags_int8_and_eval_batch():
    """pack_bags(dtype=int8) produces a scaled batch that eval_batch and
    zs_batch consume transparently, matching the f32 batch within
    quantization tolerance."""
    rng = np.random.default_rng(6)
    d = 32
    bags = [
        Bag(slide_id=f"s{i}", features=rng.normal(size=(n, d)).astype(np.float32),
            coords=None, label=i % 2)
        for i, n in enumerate([40, 64, 17, 51])
    ]
    w = rng.normal(size=(d, 2)).astype(np.float32)
    w_ext = rng.normal(size=(d, 6)).astype(np.float32)
    cfg = _episode_cfg(d)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    train_epoch, eval_batch, zs_batch = make_episode_fns(cfg)

    b32 = pack_bags(bags, n_pad=64)
    b8 = pack_bags(bags, n_pad=64, dtype=jnp.int8)
    assert b8.features.dtype == jnp.int8 and b8.scales is not None
    assert b8.scales.shape == (4, 64)
    # pad rows quantize to scale 0 (exactly-zero dequant)
    assert float(b8.scales[2, 20]) == 0.0

    wj, wej = jnp.asarray(w), jnp.asarray(w_ext)
    ev32 = np.asarray(eval_batch(params, b32, wj, wej))
    ev8 = np.asarray(eval_batch(params, b8, wj, wej))
    np.testing.assert_allclose(ev8, ev32, rtol=5e-2, atol=5e-2)

    zs32 = np.asarray(zs_batch(b32, wj, wej))
    zs8 = np.asarray(zs_batch(b8, wj, wej))
    np.testing.assert_allclose(zs8, zs32, rtol=5e-2, atol=5e-2)
