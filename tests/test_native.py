"""Tests for the native bag-packing runtime (compiled on demand)."""

import numpy as np
import pytest

from moc_tpu.data.native import build_native, native_available, pack_bags_native


def test_build_and_pack_f32():
    rng = np.random.default_rng(0)
    bags = [rng.normal(size=(n, 16)).astype(np.float32) for n in (5, 12, 1)]
    out, mask = pack_bags_native(bags, n_pad=16)
    assert out.shape == (3, 16, 16) and mask.shape == (3, 16)
    for i, b in enumerate(bags):
        np.testing.assert_allclose(out[i, : len(b)], b)
        assert float(np.abs(out[i, len(b) :]).sum()) == 0.0
        assert mask[i].sum() == len(b)


@pytest.mark.skipif(not native_available(), reason="no g++ toolchain")
def test_native_matches_numpy_and_f16():
    rng = np.random.default_rng(1)
    bags32 = [rng.normal(size=(n, 64)).astype(np.float32) for n in (100, 257, 3)]
    out, mask = pack_bags_native(bags32, n_pad=512)
    # reference numpy packing
    ref = np.zeros((3, 512, 64), np.float32)
    for i, b in enumerate(bags32):
        ref[i, : len(b)] = b
    np.testing.assert_array_equal(out, ref)

    bags16 = [b.astype(np.float16) for b in bags32]
    out16, mask16 = pack_bags_native(bags16, n_pad=512)
    np.testing.assert_allclose(out16, ref.astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(mask, mask16)


@pytest.mark.skipif(not native_available(), reason="no g++ toolchain")
def test_truncation_over_pad():
    rng = np.random.default_rng(2)
    bag = rng.normal(size=(40, 8)).astype(np.float32)
    out, mask = pack_bags_native([bag], n_pad=32)
    np.testing.assert_allclose(out[0], bag[:32])
    assert mask[0].all()


def test_pack_bags_uses_native(tmp_path):
    """The public pack_bags path produces identical results regardless of
    the native backend's availability."""
    import jax.numpy as jnp

    from moc_tpu.data import Bag, pack_bags

    rng = np.random.default_rng(3)
    bags = [Bag(f"s{i}", rng.normal(size=(50 + i, 8)).astype(np.float32), label=i)
            for i in range(3)]
    batch = pack_bags(bags, n_pad=512, device_put=False)
    assert batch.features.shape == (3, 512, 8)
    for i, b in enumerate(bags):
        np.testing.assert_allclose(np.asarray(batch.features[i, : b.n_patches]),
                                   b.features, rtol=1e-6)


def test_gather_pack_f32_matches_numpy():
    """The threaded sweep-stack gather fills exactly the rows it is given —
    column tails zeroed, offsets respected — matching the numpy formulation
    bit-for-bit (or returns False on non-native/non-contiguous input)."""
    from moc_tpu.data.native import gather_pack_f32, native_available

    rng = np.random.default_rng(5)
    n_pad, dim, total = 16, 8, 10
    srcs = [rng.normal(size=(3, 16, dim)).astype(np.float32),   # cn == n_pad
            rng.normal(size=(2, 9, dim)).astype(np.float32),    # cn < n_pad
            rng.normal(size=(4, 12, dim)).astype(np.float32)]
    offs = [0, 3, 5]
    want = np.full((total, n_pad, dim), 7.0, np.float32)  # sentinel
    for f, off in zip(srcs, offs):
        cn = f.shape[1]
        want[off : off + f.shape[0], :cn] = f
        want[off : off + f.shape[0], cn:] = 0.0
    got = np.full((total, n_pad, dim), 7.0, np.float32)
    ok = gather_pack_f32(srcs, [f.shape[1] for f in srcs], offs, got)
    if not native_available():
        assert not ok
        return
    assert ok
    np.testing.assert_array_equal(got, want)
    # rows 9.. untouched (sentinel intact)
    assert (got[9] == 7.0).all()
    # non-contiguous source refuses cleanly
    bad = srcs[0][:, ::2]
    assert not gather_pack_f32([bad], [bad.shape[1]], [0], got)
