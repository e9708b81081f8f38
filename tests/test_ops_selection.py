"""Tests for the boolean-mask selection policies and fixed-capacity gather."""

import numpy as np
import pytest
import jax.numpy as jnp

from moc_tpu import ops
from moc_tpu.ops.selection import selection_capacity
from tests import oracles as orc


def make_bags(n=41, n_fg=2, n_bg=4, pad_to=64, seed=3):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, n_fg)).astype(np.float32)
    logits_ext = np.concatenate([logits, rng.normal(size=(n, n_bg)).astype(np.float32)], axis=1)
    def pad(x):
        out = np.full((pad_to, x.shape[1]), 77.0, np.float32)
        out[:n] = x
        return out
    valid = np.arange(pad_to) < n
    return logits, logits_ext, pad(logits), pad(logits_ext), valid


@pytest.mark.parametrize("j", [5, 13])
def test_selection_masks_match_oracle_sets(j):
    logits, logits_ext, p, pe, valid = make_bags()
    n = logits.shape[0]

    def as_set(mask):
        return set(np.flatnonzero(np.asarray(mask)).tolist())

    assert as_set(ops.select_topj(jnp.asarray(p), jnp.asarray(valid), j)) == orc.sel_topj(logits, j)
    assert as_set(ops.select_delta_softmax(jnp.asarray(p), jnp.asarray(valid), j)) == orc.sel_delta_softmax(logits, j)
    assert as_set(ops.select_delta_diff(jnp.asarray(p), jnp.asarray(valid), j)) == orc.sel_delta_diff(logits, j)
    got = as_set(ops.select_bottomk_irrel(jnp.asarray(pe), jnp.asarray(valid), j, n_fg=2))
    assert got == orc.sel_bottomk_irrel(logits_ext, j, 2)
    assert all(i < n for i in got)


def test_union_matches_oracle_union():
    j = 7
    logits, logits_ext, p, pe, valid = make_bags(seed=11)
    want = (orc.sel_topj(logits, j) | orc.sel_delta_softmax(logits, j)
            | orc.sel_delta_diff(logits, j) | orc.sel_bottomk_irrel(logits_ext, j, 2))
    sel = ops.union_selection(jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), j, n_classes=2)
    got = set(np.flatnonzero(np.asarray(sel)).tolist())
    assert got == want


def test_union_discard_flags():
    j = 7
    logits, logits_ext, p, pe, valid = make_bags(seed=12)
    sel = ops.union_selection(jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), j,
                              n_classes=2, discard=("delta_softmax", "bottomk"))
    got = set(np.flatnonzero(np.asarray(sel)).tolist())
    assert got == orc.sel_topj(logits, j) | orc.sel_delta_diff(logits, j)


def test_gather_selected_sorted_and_padded():
    j = 7
    _, _, p, pe, valid = make_bags(seed=13)
    sel = ops.union_selection(jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), j, n_classes=2)
    cap = selection_capacity(j, 2, n=p.shape[0])
    idx, sel_valid, count = ops.gather_selected(sel, cap)
    idx, sel_valid, count = np.asarray(idx), np.asarray(sel_valid), int(count)
    sel_np = np.flatnonzero(np.asarray(sel))
    assert count == len(sel_np)
    assert count <= cap
    np.testing.assert_array_equal(idx[:count], sel_np)  # ascending original order
    assert not sel_valid[count:].any()
    assert (idx[count:] == 0).all()


@pytest.mark.parametrize("discard", [
    (), ("topk",), ("delta_softmax", "bottomk"), ("delta_diff",),
    ("topk", "delta_softmax", "delta_diff", "bottomk"),
])
def test_fused_union_matches_composed(discard):
    from moc_tpu.ops.selection import union_selection_composed

    for seed in (0, 1, 2):
        _, _, p, pe, valid = make_bags(seed=seed, n=50, pad_to=64)
        args = (jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), 9)
        fused = ops.union_selection(*args, n_classes=2, discard=discard)
        composed = union_selection_composed(*args, n_classes=2, discard=discard)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(composed))


@pytest.mark.parametrize("discard", [(), ("delta_softmax", "bottomk")])
def test_select_and_gather_matches_two_step(discard):
    for seed, n, pad_to in ((0, 50, 64), (1, 10, 64), (2, 64, 64)):
        _, _, p, pe, valid = make_bags(seed=seed, n=n, pad_to=pad_to)
        j = 9
        cap = selection_capacity(j, 2, n=pad_to)
        sel = ops.union_selection(jnp.asarray(p), jnp.asarray(pe),
                                  jnp.asarray(valid), j, n_classes=2,
                                  discard=discard)
        want = ops.gather_selected(sel, cap)
        got = ops.select_and_gather(jnp.asarray(p), jnp.asarray(pe),
                                    jnp.asarray(valid), j, n_classes=2,
                                    capacity=cap, discard=discard)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_capacity_bound_is_respected():
    """Worst-case adversarial bag: all four policies pick disjoint rows."""
    j, c = 4, 3
    n = 256
    rng = np.random.default_rng(99)
    logits = rng.normal(size=(n, c)).astype(np.float32)
    ext = np.concatenate([logits, rng.normal(size=(n, 4)).astype(np.float32)], axis=1)
    valid = np.ones(n, bool)
    sel = ops.union_selection(jnp.asarray(logits), jnp.asarray(ext), jnp.asarray(valid), j, n_classes=c)
    assert int(np.asarray(sel).sum()) <= selection_capacity(j, c)


def test_select_and_gather_bottomk_only():
    """bottomk as the sole policy exercises the empty-direct-candidates path."""
    _, _, p, pe, valid = make_bags(seed=5)
    j = 9
    cap = selection_capacity(j, 2, n=p.shape[0])
    discard = ("topk", "delta_softmax", "delta_diff")
    sel = ops.union_selection(jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid),
                              j, n_classes=2, discard=discard)
    want = ops.gather_selected(sel, cap)
    got = ops.select_and_gather(jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid),
                                j, n_classes=2, capacity=cap, discard=discard)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fuzz_selection_stack_vs_oracle():
    """Randomized shapes/params: the fused stack must reproduce the numpy
    oracle union and the sorted gather exactly."""
    rng = np.random.default_rng(2024)
    for trial in range(20):
        n = int(rng.integers(3, 200))
        c = int(rng.integers(2, 5))
        n_bg = int(rng.integers(1, 5))
        pad_to = n + int(rng.integers(0, 70))
        j = int(rng.integers(1, 30))
        logits = rng.normal(size=(n, c)).astype(np.float32)
        ext = np.concatenate(
            [logits, rng.normal(size=(n, n_bg)).astype(np.float32)], axis=1)
        p = np.full((pad_to, c), 99.0, np.float32); p[:n] = logits
        pe = np.full((pad_to, c + n_bg), 99.0, np.float32); pe[:n] = ext
        valid = np.arange(pad_to) < n

        want = sorted(
            orc.sel_topj(logits, min(j, n))
            | orc.sel_delta_softmax(logits, min(j, n))
            | orc.sel_delta_diff(logits, min(j, n))
            | orc.sel_bottomk_irrel(ext, min(j, n), c))
        cap = selection_capacity(j, c, n=pad_to)
        idx, sv, count = ops.select_and_gather(
            jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), j,
            n_classes=c, capacity=cap)
        idx, sv, count = np.asarray(idx), np.asarray(sv), int(count)
        assert count == len(want), (trial, n, c, j)
        np.testing.assert_array_equal(idx[:count], want)
        assert not sv[count:].any()


def test_topk_threshold_mask_matches_lax_topk():
    """Both implementations of the exact top-k membership mask reproduce the
    jax.lax.top_k set, including tie resolution (lowest index) and ±0.0."""
    import jax

    rng = np.random.default_rng(7)
    for n, k in [(256, 40), (300, 17), (128, 128)]:
        for kind in range(3):
            if kind == 0:
                keys = rng.normal(size=(4, n)).astype(np.float32)
            elif kind == 1:
                keys = rng.integers(-3, 3, size=(4, n)).astype(np.float32)
            else:
                keys = rng.choice([-0.0, 0.0, 1.0, -1.0],
                                  size=(4, n)).astype(np.float32)
            kk = min(k, n)
            _, ridx = jax.lax.top_k(jnp.asarray(keys), kk)
            for impl in ("xla", "pallas"):
                mask = np.asarray(
                    ops.topk_threshold_mask(jnp.asarray(keys), kk, impl=impl))
                assert (mask.sum(-1) == kk).all()
                for r in range(keys.shape[0]):
                    ref = np.zeros(n, bool)
                    ref[np.asarray(ridx)[r]] = True
                    np.testing.assert_array_equal(mask[r], ref,
                                                  err_msg=f"{impl} {n} {kk} {kind}")


@pytest.mark.slow
def test_threshold_mask_bits_per_step_bit_identical():
    """The widened g-bit descent (2^g−1 stacked candidate prefixes per
    step) must reproduce the 1-bit descent exactly for every g dividing 32
    — ties, ±0.0, −inf, both axes."""
    from moc_tpu.ops.masking import threshold_topk_mask

    rng = np.random.default_rng(11)
    for trial in range(12):
        # third shape exercises a REAL multi-row axis-0 descent (512 rows,
        # k drawn from the reduced-axis length, not the trailing dim)
        shp = [(5, 2048), (3, 4, 512), (512, 8)][trial % 3]
        ax = -1 if trial % 3 != 2 else 0
        x = rng.normal(size=shp).astype(np.float32)
        if trial % 2:
            x = np.round(x * 4) / 4  # heavy ties
        x.flat[::7] = -np.inf
        x.flat[1::11] = 0.0
        x.flat[2::13] = -0.0
        k = int(rng.integers(1, min(401, shp[ax])))
        base = np.asarray(threshold_topk_mask(jnp.asarray(x), k, axis=ax))
        for g in (2, 4, 8):
            got = np.asarray(threshold_topk_mask(jnp.asarray(x), k, axis=ax,
                                                 bits_per_step=g))
            np.testing.assert_array_equal(got, base,
                                          err_msg=f"g={g} k={k} ax={ax}")


@pytest.mark.parametrize("discard", [(), ("topk",), ("bottomk",),
                                     ("delta_softmax", "delta_diff")])
def test_union_threshold_matches_sort_union(discard):
    rng = np.random.default_rng(11)
    for trial in range(6):
        n, c, n_bg = 140, 3, 4
        pad_to = 192
        logits = rng.normal(size=(n, c)).astype(np.float32)
        if trial % 2:
            logits = np.round(logits)  # tie-heavy
        ext = np.concatenate(
            [logits, rng.normal(size=(n, n_bg)).astype(np.float32)], axis=1)
        p = np.full((pad_to, c), 9.0, np.float32); p[:n] = logits
        pe = np.full((pad_to, c + n_bg), 9.0, np.float32); pe[:n] = ext
        valid = np.arange(pad_to) < n
        a = np.asarray(ops.union_selection(
            jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), 23, c, discard))
        b = np.asarray(ops.union_selection_threshold(
            jnp.asarray(p), jnp.asarray(pe), jnp.asarray(valid), 23, c, discard))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_select_and_gather_threshold_method_identical():
    rng = np.random.default_rng(13)
    for trial in range(8):
        n = int(rng.integers(3, 200))
        c = int(rng.integers(2, 5))
        pad_to = n + int(rng.integers(0, 64))
        j = int(rng.integers(1, 30))
        logits = rng.normal(size=(n, c)).astype(np.float32)
        if trial % 3 == 0:
            logits = np.round(logits * 2)
        ext = np.concatenate(
            [logits, rng.normal(size=(n, 3)).astype(np.float32)], axis=1)
        p = np.full((pad_to, c), 5.0, np.float32); p[:n] = logits
        pe = np.full((pad_to, c + 3), 5.0, np.float32); pe[:n] = ext
        valid = np.arange(pad_to) < n
        cap = selection_capacity(j, c, n=pad_to)
        a = ops.select_and_gather(jnp.asarray(p), jnp.asarray(pe),
                                  jnp.asarray(valid), j, c, cap)
        b = ops.select_and_gather(jnp.asarray(p), jnp.asarray(pe),
                                  jnp.asarray(valid), j, c, cap,
                                  method="threshold")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_threshold_method_across_bucket_shapes():
    """Bit-identical sort/threshold selection at the loader's real bucket
    sizes, non-lane-aligned lengths, and nearly-empty bags."""
    rng = np.random.default_rng(17)
    for n, valid_n in [(4096, 3777), (999, 999), (200, 7)]:
        logits = rng.normal(size=(n, 2)).astype(np.float32)
        ext = rng.normal(size=(n, 6)).astype(np.float32)
        valid = np.arange(n) < valid_n
        cap = selection_capacity(400, 2, n=n)
        a = ops.select_and_gather(jnp.asarray(logits), jnp.asarray(ext),
                                  jnp.asarray(valid), 400, 2, cap)
        b = ops.select_and_gather(jnp.asarray(logits), jnp.asarray(ext),
                                  jnp.asarray(valid), 400, 2, cap,
                                  method="threshold")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{n}/{valid_n}")
