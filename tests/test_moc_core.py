"""Tests for the MOC core: slide_process views, fusion, episode training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moc_tpu.moc import (
    MOCConfig,
    fuse_views,
    moc_slide_logits,
    run_episode,
    selection_capacity_for,
    slide_process,
)
from moc_tpu.models import SENet
from tests import oracles


def _rand_bag(rng, n, n_valid, d=32):
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats[n_valid:] = 0.0
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return feats, valid


def _oracle_views(feats, w, w_ext, topj, n_classes):
    """Reference slide_process on an unpadded bag (main_moc.py:322-375)."""
    logits = feats @ w
    logits_ext = feats @ w_ext
    sel = set()
    sel |= oracles.sel_topj(logits, topj)
    sel |= oracles.sel_delta_softmax(logits, topj)
    sel |= oracles.sel_delta_diff(logits, topj)
    sel |= oracles.sel_bottomk_irrel(logits_ext, topj, n_classes)
    idx = np.array(sorted(sel))
    sl = logits[idx]
    sle = logits_ext[idx]
    v0 = sl
    v1 = oracles.softmax(sl, axis=1)
    v2 = np.broadcast_to(oracles.row_margin(sl)[:, None], sl.shape)
    v3 = np.broadcast_to(sle[:, n_classes:].max(axis=1)[:, None], sl.shape)
    return idx, np.stack([v0, v1, v2, v3])


@pytest.mark.parametrize("n,n_valid,c,ce,topj", [(256, 256, 2, 6, 10), (256, 170, 3, 7, 8)])
def test_slide_process_matches_oracle(n, n_valid, c, ce, topj):
    rng = np.random.default_rng(0)
    feats, valid = _rand_bag(rng, n, n_valid)
    w = rng.normal(size=(32, c)).astype(np.float32)
    w_ext = rng.normal(size=(32, ce)).astype(np.float32)
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=topj, feature_dim=32)

    sel = jax.jit(lambda f, v: slide_process(f, v, jnp.asarray(w), jnp.asarray(w_ext), cfg))(
        feats, valid
    )
    ref_idx, ref_views = _oracle_views(feats[:n_valid], w, w_ext, topj, c)

    count = int(sel.count)
    assert count == len(ref_idx)
    got_idx = np.asarray(sel.idx)[: count]
    np.testing.assert_array_equal(got_idx, ref_idx)
    got_views = np.asarray(sel.views)[:, :count, :]
    np.testing.assert_allclose(got_views, ref_views, rtol=1e-4, atol=1e-5)
    # invalid capacity slots are zeroed features
    sv = np.asarray(sel.valid)
    assert sv[:count].all() and not sv[count:].any()
    assert np.abs(np.asarray(sel.feats)[count:]).sum() == 0.0


def test_slide_process_pad_invariance():
    rng = np.random.default_rng(1)
    feats, valid = _rand_bag(rng, 512, 300)
    w = rng.normal(size=(32, 2)).astype(np.float32)
    w_ext = rng.normal(size=(32, 6)).astype(np.float32)
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=12, feature_dim=32)
    a = slide_process(jnp.asarray(feats), jnp.asarray(valid), jnp.asarray(w), jnp.asarray(w_ext), cfg)
    feats2 = np.concatenate([feats, np.zeros((512, 32), np.float32)])
    valid2 = np.concatenate([valid, np.zeros(512, bool)])
    b = slide_process(jnp.asarray(feats2), jnp.asarray(valid2), jnp.asarray(w), jnp.asarray(w_ext), cfg)
    count = int(a.count)
    assert int(b.count) == count
    np.testing.assert_array_equal(np.asarray(a.idx)[:count], np.asarray(b.idx)[:count])
    np.testing.assert_allclose(
        np.asarray(a.views)[:, :count], np.asarray(b.views)[:, :count], rtol=1e-5
    )


def test_fuse_views_discard():
    rng = np.random.default_rng(2)
    weights = jnp.asarray(rng.random((5, 4)).astype(np.float32))
    views = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    full = fuse_views(weights, views, (True, True, True, True))
    ref = sum(np.asarray(weights)[:, i : i + 1] * np.asarray(views)[i] for i in range(4))
    np.testing.assert_allclose(np.asarray(full), ref, rtol=1e-5)
    no_bk = fuse_views(weights, views, (True, True, True, False))
    ref_no_bk = ref - np.asarray(weights)[:, 3:4] * np.asarray(views)[3]
    np.testing.assert_allclose(np.asarray(no_bk), ref_no_bk, rtol=1e-5)


def test_selection_capacity():
    assert selection_capacity_for(400, 2, 32768) == 2432
    assert selection_capacity_for(400, 2, 1024) == 1024  # capped by bag
    assert selection_capacity_for(10, 3, 4096) == 128


def test_moc_slide_logits_shapes_and_grads():
    rng = np.random.default_rng(3)
    feats, valid = _rand_bag(rng, 256, 200)
    w = rng.normal(size=(32, 2)).astype(np.float32)
    w_ext = rng.normal(size=(32, 6)).astype(np.float32)
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=10, topk=4, feature_dim=32)
    model = SENet(in_dim=32, out_dim=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))

    def loss(p):
        logits = moc_slide_logits(model.apply, p, jnp.asarray(feats), jnp.asarray(valid),
                                  jnp.asarray(w), jnp.asarray(w_ext), cfg)
        return logits[0] - logits[1]

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)


@pytest.mark.slow
def test_run_episode_learns_synthetic(tmp_path):
    """End-to-end: MOC episode on the synthetic corpus reaches high test AUC
    and beats/matches the structure of the zero-shot floor."""
    from moc_tpu.data import (BagLoader, EpisodeBags, SlideTable,
                              make_synthetic_corpus, read_split_csv)
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    cfg_data = SyntheticWSIConfig(slides_per_class=10, min_patches=200,
                                  max_patches=480, dim=64, seed=7, signal=0.9)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(2,), n_folds=1,
                                   val_per_class=2, test_per_class=4)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    split = read_split_csv(corpus["split_paths"][(2, 0)])
    ep = EpisodeBags.load(loader, split.train, split.val, split.test,
                          repeat_num=4, eval_batch_size=4)
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=6, feature_dim=64)
    result = run_episode(ep, corpus["weights"], corpus["weights_ext"], cfg, seed=0)
    assert result.zero_shot_test is not None
    assert result.best_val > 0.5
    assert result.test_at_best_val >= 0.8  # separable corpus: must classify well
    assert 0 <= result.best_epoch < cfg.num_epochs


def test_dense_mode_matches_exact_on_separable_logits():
    """Dense (selection-free) eval equals the exact path whenever the fused
    top-k rows all lie inside the union — guaranteed here by construction."""
    from moc_tpu.moc import moc_slide_logits, moc_slide_logits_dense
    from moc_tpu.models import SENet

    rng = np.random.default_rng(0)
    n, d, c, ce = 512, 32, 2, 6
    feats = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    # plant strong class-0 rows: they dominate every ranking AND the pool
    feats[:20] += 3.0
    valid = np.ones(n, bool)
    w = rng.normal(size=(d, c)).astype(np.float32)
    w_ext = rng.normal(size=(d, ce)).astype(np.float32)
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=64, topk=10, feature_dim=d)
    model = SENet(in_dim=d, out_dim=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d)))
    exact = moc_slide_logits(model.apply, params, jnp.asarray(feats), jnp.asarray(valid),
                             jnp.asarray(w), jnp.asarray(w_ext), cfg)
    dense = moc_slide_logits_dense(model.apply, params, jnp.asarray(feats),
                                   jnp.asarray(valid), jnp.asarray(w),
                                   jnp.asarray(w_ext), cfg)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(dense), rtol=2e-5, atol=2e-5)


def test_dense_flag_in_episode_fns():
    import dataclasses as dc

    from moc_tpu.moc import make_episode_fns
    from moc_tpu.data.batching import BagBatch

    rng = np.random.default_rng(1)
    b, n, d = 2, 256, 32
    batch = BagBatch(
        features=jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32)),
        mask=jnp.ones((b, n), bool),
        labels=jnp.zeros((b,), jnp.int32),
        n_patches=jnp.full((b,), n, jnp.int32),
    )
    w = jnp.asarray(rng.normal(size=(d, 2)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(d, 6)).astype(np.float32))
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=16, topk=4,
                    feature_dim=d, dense=True)
    from moc_tpu.moc import init_senet

    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    _, eval_batch, _ = make_episode_fns(cfg)
    out = eval_batch(params, batch, w, w_ext)
    assert out.shape == (b, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dense_fused_senet_matches_unfused():
    """The dense path's fused scoring+senet matmul must equal applying the
    senet module separately (same weights, one feats pass)."""
    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.moc.core import fuse_views, moc_slide_logits_dense
    from moc_tpu import ops

    rng = np.random.default_rng(0)
    n, d, c, ce = 300, 512, 2, 6
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 250)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=40, topk=10,
                    feature_dim=d, dense=True)
    model, params = init_senet(jax.random.PRNGKey(3), cfg)

    got = moc_slide_logits_dense(model.apply, params, feats, valid, w, we, cfg)

    # unfused restatement: separate matmuls + the senet module itself
    logits = feats @ w
    logits_ext = feats @ we
    top2 = jax.lax.top_k(logits, 2)[0]
    margin = jnp.abs(top2[:, 0] - top2[:, 1])
    views = jnp.stack([
        logits, jax.nn.softmax(logits, axis=1),
        jnp.broadcast_to(margin[:, None], logits.shape),
        jnp.broadcast_to(jnp.max(logits_ext[:, c:], axis=1)[:, None], logits.shape),
    ])
    weights = model.apply(params, feats)
    fused = fuse_views(weights, views, cfg.include_flags())
    want = ops.topj_pooling(fused, valid, cfg.topk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_score_dtype_views_exact_and_selection_close():
    """score_dtype=bfloat16: union membership may flip near-tied boundary
    rows, but views for selected rows are exact (f32 re-score)."""
    import dataclasses as dc

    from moc_tpu.moc import MOCConfig
    from moc_tpu.moc.core import slide_process

    rng = np.random.default_rng(0)
    n, d, c, ce = 512, 512, 2, 6
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 450)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=40, topk=10, feature_dim=d)

    exact = slide_process(feats, valid, w, we, cfg)
    fast = slide_process(feats, valid, w, we,
                         dc.replace(cfg, score_dtype="bfloat16"))

    sel_e = set(np.asarray(exact.idx)[np.asarray(exact.valid)].tolist())
    sel_f = set(np.asarray(fast.idx)[np.asarray(fast.valid)].tolist())
    overlap = len(sel_e & sel_f) / max(len(sel_e | sel_f), 1)
    assert overlap > 0.95, overlap

    # rows selected by both must carry identical (f32-exact) view values
    common = sorted(sel_e & sel_f)
    pos_e = {int(i): p for p, i in enumerate(np.asarray(exact.idx))
             if bool(np.asarray(exact.valid)[p])}
    pos_f = {int(i): p for p, i in enumerate(np.asarray(fast.idx))
             if bool(np.asarray(fast.valid)[p])}
    ve, vf = np.asarray(exact.views), np.asarray(fast.views)
    for i in common[:50]:
        np.testing.assert_allclose(ve[:, pos_e[i]], vf[:, pos_f[i]],
                                   rtol=1e-6, atol=1e-6)


def test_dense_bf16_keeps_argmax_on_separable():
    import dataclasses as dc

    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.moc.core import moc_slide_logits_dense

    rng = np.random.default_rng(1)
    n, d, c, ce = 400, 512, 2, 6
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=40, topk=10,
                    feature_dim=d, dense=True)
    model, params = init_senet(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 350)
    for label in (0, 1):
        mu = np.zeros(d, np.float32)
        mu += np.asarray(w[:, label]) * 0.05  # lean toward class `label`
        feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) + mu)
        f32 = moc_slide_logits_dense(model.apply, params, feats, valid, w, we, cfg)
        b16 = moc_slide_logits_dense(model.apply, params, feats, valid, w, we,
                                     dc.replace(cfg, score_dtype="bfloat16"))
        assert int(jnp.argmax(f32)) == int(jnp.argmax(b16))
        np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                                   rtol=3e-2, atol=3e-2)


def test_zs_pooling_selectable():
    """zs_batch routes foreground families to feats @ w and the bottomk
    family to feats @ w_ext with n_fg=n_classes (ref main_moc.py:429-432)."""
    from moc_tpu import ops
    from moc_tpu.data.batching import BagBatch
    from moc_tpu.moc import make_episode_fns

    rng = np.random.default_rng(5)
    n, d, c, ce = 96, 32, 2, 6
    feats = rng.normal(size=(2, n, d)).astype(np.float32)
    mask = np.ones((2, n), bool)
    mask[1, 70:] = False
    w = rng.normal(size=(d, c)).astype(np.float32)
    w_ext = rng.normal(size=(d, ce)).astype(np.float32)
    batch = BagBatch(features=jnp.asarray(feats), mask=jnp.asarray(mask),
                     labels=jnp.zeros((2,), jnp.int32),
                     n_patches=jnp.asarray(mask.sum(1), jnp.int32))

    for name, fn in ops.POOLING_REGISTRY.items():
        cfg = MOCConfig(n_classes=c, n_ext_classes=ce, topj=16, topk=8,
                        feature_dim=d, zs_pooling=name)
        _, _, zs_batch = make_episode_fns(cfg)
        got = np.asarray(zs_batch(batch, jnp.asarray(w), jnp.asarray(w_ext)))
        for i in range(2):
            f, v = jnp.asarray(feats[i]), jnp.asarray(mask[i])
            if name in ops.FOREGROUND_POOLINGS:
                want = fn(f @ w, v, cfg.topk)
            else:
                want = fn(f @ w_ext, v, cfg.topk, n_fg=c)
            np.testing.assert_allclose(got[i], np.asarray(want), rtol=1e-5,
                                       atol=1e-5, err_msg=name)
        if name not in ops.FOREGROUND_POOLINGS:
            assert got.shape[1] >= c  # fg columns (+ top1-bg col in detection)


def test_masked_exact_matches_gather_exact():
    """The gather-free masked exact path must reproduce the compact-then-
    process formulation: same union, same per-row values, same pooled
    logits — across pad amounts, near-empty bags, drop-mask RNG, and
    discard subsets."""
    from moc_tpu.moc import init_senet, moc_slide_logits_masked

    rng = np.random.default_rng(9)
    d, c, ce = 32, 2, 6
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    gather_cfg = lambda **kw: MOCConfig(n_classes=c, n_ext_classes=ce,
                                        feature_dim=d, exact_impl="gather", **kw)
    masked_cfg = lambda **kw: MOCConfig(n_classes=c, n_ext_classes=ce,
                                        feature_dim=d, exact_impl="masked", **kw)
    _, params = init_senet(jax.random.PRNGKey(3), masked_cfg(topj=16))
    apply = SENet(in_dim=d, out_dim=4).apply

    cases = [
        dict(n=256, n_valid=256, topj=16, topk=8),
        dict(n=256, n_valid=180, topj=16, topk=8),
        dict(n=128, n_valid=3, topj=16, topk=8),  # union smaller than topk
        dict(n=512, n_valid=400, topj=64, topk=10),
    ]
    for case in cases:
        feats, valid = _rand_bag(rng, case["n"], case["n_valid"], d)
        f, v = jnp.asarray(feats), jnp.asarray(valid)
        for discard in [(), ("delta_softmax",), ("topk", "bottomk")]:
            kw = dict(topj=case["topj"], topk=case["topk"], discard=discard)
            got = moc_slide_logits_masked(apply, params, f, v, w, w_ext,
                                          masked_cfg(**kw), None)
            want = moc_slide_logits(apply, params, f, v, w, w_ext,
                                    gather_cfg(**kw), None)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{case} discard={discard}")
        # train-time drop mask: same rng thins the same rows in both paths
        key = jax.random.PRNGKey(11)
        kw = dict(topj=case["topj"], topk=case["topk"])
        got = moc_slide_logits_masked(apply, params, f, v, w, w_ext,
                                      masked_cfg(**kw), key)
        want = moc_slide_logits(apply, params, f, v, w, w_ext,
                                gather_cfg(**kw), key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_moc_slide_logits_routes_masked_by_default():
    """Default config (auto, f32) routes inference through the masked path;
    bf16 scoring falls back to the gather path (its exactness needs the f32
    re-score); training steps (rng given) route to gather under auto — all
    three produce equal values (the equivalence test above)."""
    from moc_tpu.moc import init_senet, moc_slide_logits_masked

    rng = np.random.default_rng(4)
    d, c, ce = 32, 2, 6
    feats, valid = _rand_bag(rng, 256, 200, d)
    f, v = jnp.asarray(feats), jnp.asarray(valid)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    cfg = MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16, topk=8)
    assert cfg.exact_impl == "auto"
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    apply = SENet(in_dim=d, out_dim=4).apply
    via_dispatch = moc_slide_logits(apply, params, f, v, w, w_ext, cfg, None)
    direct = moc_slide_logits_masked(apply, params, f, v, w, w_ext, cfg, None)
    np.testing.assert_array_equal(np.asarray(via_dispatch), np.asarray(direct))


def test_bf16_resident_feats_route_masked_and_match_gather():
    """bf16-RESIDENT features (the --storage_dtype serving tier) stay on the
    masked path — there is no wider original to re-score, so masked equals
    the gather formulation given the SAME quantized inputs — and the values
    track the f32 forward within quantization tolerance."""
    from moc_tpu.moc import init_senet, moc_slide_logits_masked

    rng = np.random.default_rng(21)
    d, c, ce = 32, 2, 6
    feats, valid = _rand_bag(rng, 256, 200, d)
    f32, v = jnp.asarray(feats), jnp.asarray(valid)
    f16 = f32.astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    cfg16 = MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16,
                      topk=8, score_dtype="bfloat16")
    _, params = init_senet(jax.random.PRNGKey(0), cfg16)
    apply = SENet(in_dim=d, out_dim=4).apply

    # auto + bf16 feats dispatches to masked (bf16 SCORING of f32 feats
    # would have gone to gather — asserted by the routing test above)
    via_dispatch = moc_slide_logits(apply, params, f16, v, w, w_ext, cfg16, None)
    direct = moc_slide_logits_masked(apply, params, f16, v, w, w_ext, cfg16, None)
    np.testing.assert_array_equal(np.asarray(via_dispatch), np.asarray(direct))

    # same quantized inputs through the gather formulation: close (the two
    # paths reduce at different shapes; bf16 intermediates widen the ulp)
    gather = moc_slide_logits(
        apply, params, f16, v, w, w_ext,
        MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16,
                  topk=8, score_dtype="bfloat16", exact_impl="gather"), None)
    np.testing.assert_allclose(np.asarray(via_dispatch), np.asarray(gather),
                               rtol=3e-2, atol=3e-2)

    # and the tier tracks the exact f32 forward within quantization noise
    exact = moc_slide_logits(
        apply, params, f32, v, w, w_ext,
        MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16,
                  topk=8), None)
    np.testing.assert_allclose(np.asarray(via_dispatch), np.asarray(exact),
                               rtol=5e-2, atol=5e-2)


def test_ablation_masked_matches_gather():
    """The masked ablation forward equals the gather formulation for every
    fusion mode."""
    from moc_tpu.moc import ablation_slide_logits

    rng = np.random.default_rng(12)
    d, c, ce = 32, 2, 6
    feats, valid = _rand_bag(rng, 256, 190, d)
    f, v = jnp.asarray(feats), jnp.asarray(valid)
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(d, ce)).astype(np.float32))
    for mode in ("avg", "sum", "max"):
        got = ablation_slide_logits(
            f, v, w, w_ext,
            MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16,
                      topk=8), mode)
        want = ablation_slide_logits(
            f, v, w, w_ext,
            MOCConfig(n_classes=c, n_ext_classes=ce, feature_dim=d, topj=16,
                      topk=8, exact_impl="gather"), mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6, err_msg=mode)
