"""Golden + property tests for moc_tpu.ops pooling policies.

Oracle: independent NumPy restatement (tests/oracles.py) on the unpadded bag.
Property: padding invariance — appending pad rows must not change any result.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from moc_tpu import ops
from tests import oracles as orc

RNG = np.random.default_rng(0)


def make_bag(n=37, c=3, pad_to=64, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, c)).astype(np.float32)
    padded = np.zeros((pad_to, c), np.float32)
    padded[:n] = logits
    # poison the pad region to catch mask leaks
    padded[n:] = rng.normal(size=(pad_to - n, c)) * 100 + 50
    valid = np.zeros(pad_to, bool)
    valid[:n] = True
    return logits, padded, valid


SIMPLE_CASES = [
    ("topj", orc.topj_pool),
    ("delta_softmax", orc.delta_softmax_pool),
    ("delta_diff", orc.delta_diff_pool),
    ("topj_delta_softmax", orc.topj_delta_softmax_pool),
    ("topj_delta_diff", orc.topj_delta_diff_pool),
]


@pytest.mark.parametrize("name,oracle", SIMPLE_CASES)
@pytest.mark.parametrize("n,j", [(37, 5), (37, 64), (7, 10), (1, 3)])
def test_simple_pooling_matches_oracle(name, oracle, n, j):
    c = 3
    logits, padded, valid = make_bag(n=n, c=c, seed=n * 31 + j)
    fn = ops.POOLING_REGISTRY[name]
    got = np.asarray(fn(jnp.asarray(padded), jnp.asarray(valid), j))
    want = oracle(logits, j)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


BOTTOMK_CASES = [
    ("bottomk_irrel", lambda L, j, nf, det: orc.bottomk_irrel_pool(L, j, nf, detection=det)),
    ("bottomk_irrel_delta_softmax",
     lambda L, j, nf, det: orc.bottomk_irrel_rank_pool(L, j, nf, lambda f: orc.softmax(f, 1), detection=det)),
    ("bottomk_irrel_delta_diff",
     lambda L, j, nf, det: orc.bottomk_irrel_rank_pool(
         L, j, nf, lambda f: np.broadcast_to(orc.row_margin(f)[:, None], f.shape), detection=det)),
    ("topj_bottomk_irrel_delta_softmax",
     lambda L, j, nf, det: orc.bottomk_irrel_rank_pool(L, j, nf, lambda f: orc.softmax(f, 1) * f, detection=det)),
    ("topj_bottomk_irrel_delta_diff",
     lambda L, j, nf, det: orc.bottomk_irrel_rank_pool(
         L, j, nf, lambda f: f * orc.row_margin(f)[:, None], detection=det)),
]


@pytest.mark.parametrize("name,oracle", BOTTOMK_CASES)
@pytest.mark.parametrize("n,j,detection", [(53, 7, False), (53, 7, True), (11, 20, False)])
def test_bottomk_pooling_matches_oracle(name, oracle, n, j, detection):
    n_fg, n_bg = 3, 4
    logits, padded, valid = make_bag(n=n, c=n_fg + n_bg, seed=n * 7 + j)
    fn = ops.POOLING_REGISTRY[name]
    got = np.asarray(fn(jnp.asarray(padded), jnp.asarray(valid), j, n_fg=n_fg, detection=detection))
    want = oracle(logits, j, n_fg, detection)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_padding_invariance():
    """Same bag under two different pad sizes → identical pooled logits."""
    n, c, j = 29, 3, 8
    rng = np.random.default_rng(42)
    logits = rng.normal(size=(n, c)).astype(np.float32)
    for pad_to in (n, 32, 128):
        padded = np.full((pad_to, c), 99.0, np.float32)
        padded[:n] = logits
        valid = np.arange(pad_to) < n
        got = np.asarray(ops.topj_pooling(jnp.asarray(padded), jnp.asarray(valid), j))
        np.testing.assert_allclose(got, orc.topj_pool(logits, j), rtol=1e-6)


def test_return_indices_within_valid():
    n, c, j = 21, 4, 6
    _, padded, valid = make_bag(n=n, c=c, pad_to=48, seed=9)
    _, idx = ops.topj_pooling(jnp.asarray(padded), jnp.asarray(valid), j, return_indices=True)
    assert np.all(np.asarray(idx) < n)


def test_gather_pooling_zero_valid_sentinel_and_nan_pads():
    """Gather-formulation pooling paths honor the zero-valid NEG_INF
    sentinel and ignore NaN/inf pad rows beyond the valid count (review r3:
    topk_mean's multiply-by-weight propagated 0*NaN, and zero-valid bags
    leaked raw pad-row logits)."""
    rng = np.random.default_rng(4)
    NEG = -1e30
    logits_ext = rng.normal(size=(12, 4)).astype(np.float32)
    # zero-valid: sentinel, and pad-content independent
    none = np.zeros(12, bool)
    out = np.asarray(ops.bottomk_irrel_pooling(
        jnp.asarray(logits_ext), jnp.asarray(none), 4, n_fg=2))
    assert (out <= NEG / 2).all()
    perturbed = logits_ext.copy()
    perturbed[0] = 42.0
    out2 = np.asarray(ops.bottomk_irrel_pooling(
        jnp.asarray(perturbed), jnp.asarray(none), 4, n_fg=2))
    np.testing.assert_array_equal(out, out2)
    pooled, _ = ops.delta_softmax_pooling(
        jnp.asarray(logits_ext[:, :3]), jnp.asarray(none), 4,
        return_indices=True)
    assert (np.asarray(pooled) <= NEG / 2).all()
    # NaN pads beyond the valid count do not propagate
    some = np.arange(12) < 3
    with_nan = logits_ext.copy(); with_nan[3:] = np.nan
    with_zero = logits_ext.copy(); with_zero[3:] = 0.0
    o_nan = np.asarray(ops.bottomk_irrel_pooling(
        jnp.asarray(with_nan), jnp.asarray(some), 8, n_fg=2))
    o_zero = np.asarray(ops.bottomk_irrel_pooling(
        jnp.asarray(with_zero), jnp.asarray(some), 8, n_fg=2))
    assert np.isfinite(o_nan).all()
    np.testing.assert_allclose(o_nan, o_zero, rtol=1e-6)
