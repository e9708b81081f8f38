"""CLI + config + checkpoint tests (subprocess smoke runs on synthetic data)."""

import glob
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.config import NSCLC, PRESETS, RCC, MocRunConfig
from moc_tpu.utils.checkpoint import load_params, save_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=420):
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
               PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m"] + args + ["--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_presets():
    assert PRESETS["nsclc"] is NSCLC and PRESETS["rcc"] is RCC
    assert NSCLC.n_classes == 2 and NSCLC.n_ext_classes == 6
    assert RCC.n_classes == 3 and RCC.n_ext_classes == 7
    assert NSCLC.repeat_num(8) == 16  # ref main_moc.py:220
    assert RCC.repeat_num(8) == 24  # ref main_moc.py:281
    assert NSCLC.split_csv("/d", 4, 2).endswith("splits/nsclc_fewshot/4shots/splits_2.csv")
    cfg = MocRunConfig(dataset="rcc")
    assert cfg.preset is RCC


def test_save_load_params(tmp_path):
    params = {"params": {"dense": {"kernel": jnp.ones((3, 2)), "bias": jnp.zeros(2)}}}
    p = str(tmp_path / "m.msgpack")
    save_params(p, params)
    template = jax.tree.map(jnp.zeros_like, params)
    back = load_params(p, template)
    np.testing.assert_array_equal(np.asarray(back["params"]["dense"]["kernel"]),
                                  np.ones((3, 2)))


def test_orbax_roundtrip(tmp_path):
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt_state = optax.adam(1e-3).init(params)
    tree = {"params": params, "opt_state": opt_state, "step": jnp.int32(7)}
    from moc_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, tree)
    assert latest_step(d) == 7
    template = jax.tree.map(jnp.zeros_like, tree)
    back = restore_checkpoint(d, template)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]), np.asarray(params["w"]))
    assert int(back["step"]) == 7


@pytest.mark.slow
def test_main_moc_cli_synthetic(tmp_path):
    out = str(tmp_path / "run")
    r = _run_cli(["moc_tpu.cli.main_moc", "--dataset", "synthetic", "--shot", "1",
                  "--fold", "0", "--topj", "32", "--topk", "10",
                  "--num_epochs", "2", "--result_dir", out])
    assert r.returncode == 0, r.stderr[-3000:]
    payload = json.load(open(os.path.join(out, "best_results_shot_1_fold_0.json")))
    assert {"best_val", "test_at_best_val", "test_acc_at_best_val",
            "best_epoch", "zero_shot_test"} <= set(payload)
    assert os.path.exists(os.path.join(out, "best_model_shot_1_fold_0.msgpack"))
    assert os.path.exists(os.path.join(out, "zs_results_shot_1_fold_0.json"))

    # ablation mode reuses the same corpus
    r2 = _run_cli(["moc_tpu.cli.main_moc", "--dataset", "synthetic", "--shot", "1",
                   "--fold", "0", "--topj", "32", "--ablation_study", "max",
                   "--result_dir", out])
    assert r2.returncode == 0, r2.stderr[-3000:]
    ab = json.load(open(os.path.join(out, "ablation_results_max_shot_1_fold_0.json")))
    assert {"loss", "acc", "auc"} <= set(ab)


@pytest.mark.slow
def test_main_moc_fold_matches_sweep(tmp_path):
    """main_moc (per-fold process, the reference protocol) and the sweep CLI
    must produce IDENTICAL results for the same (shot, fold, seed) — review
    r3: the sweep previously salted the seed per fold, so the two entry
    points silently disagreed on the same episode."""
    common = ["--topj", "32", "--topk", "10", "--num_epochs", "2"]
    moc_dir = str(tmp_path / "moc")
    r = _run_cli(["moc_tpu.cli.main_moc", "--dataset", "synthetic", "--shot",
                  "1", "--fold", "1", *common, "--result_dir", moc_dir],
                 timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    sweep_dir = str(tmp_path / "sweep")
    r2 = _run_cli(["moc_tpu.cli.sweep", "--dataset", "synthetic", "--shots",
                   "1", "--folds", "1", *common, "--mode", "stream",
                   "--result_dir", sweep_dir], timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    a = json.load(open(os.path.join(
        moc_dir, "best_results_shot_1_fold_1.json")))
    b = json.load(open(os.path.join(
        sweep_dir, "1_shot", "best_results_shot_1_fold_1.json")))
    assert a["best_epoch"] == b["best_epoch"]
    for key in ("best_val", "test_at_best_val", "test_acc_at_best_val"):
        assert abs(a[key] - b[key]) < 1e-6, (key, a[key], b[key])


def test_ebrains_presets():
    assert PRESETS["ebrains12"].n_classes == 12
    assert PRESETS["ebrains30"].n_classes == 30
    assert PRESETS["ebrains12"].n_ext_classes == 16
    assert PRESETS["ebrains30"].repeat_num(4) == 120
    # ext label dict extends the class dict with the 4 normal-tissue classes
    ext = PRESETS["ebrains12"].label_dict_ext
    assert ext["Stroma"] >= 12 and len(set(ext.values())) == 16


@pytest.mark.slow
def test_sweep_cli_fused_matches_stream(tmp_path):
    """The default (fused) sweep CLI and --mode stream write identical
    result files; the fused path is the shipped flagship (VERDICT r1 #1)."""
    base = ["moc_tpu.cli.sweep", "--dataset", "synthetic", "--shots", "1",
            "--folds", "0", "1", "--topj", "32", "--topk", "10",
            "--num_epochs", "2"]
    fused_dir = str(tmp_path / "fused")
    r = _run_cli(base + ["--result_dir", fused_dir, "--mode", "fused"], timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "(fused)" in r.stdout
    stream_dir = str(tmp_path / "stream")
    r2 = _run_cli(base + ["--result_dir", stream_dir, "--mode", "stream"], timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]

    for fold in (0, 1):
        fused = json.load(open(os.path.join(
            fused_dir, "1_shot", f"best_results_shot_1_fold_{fold}.json")))
        stream = json.load(open(os.path.join(
            stream_dir, "1_shot", f"best_results_shot_1_fold_{fold}.json")))
        assert fused["best_epoch"] == stream["best_epoch"]
        for key in ("best_val", "test_at_best_val", "test_acc_at_best_val"):
            assert abs(fused[key] - stream[key]) < 1e-5, (key, fused, stream)
        # the zero-shot floor matches: the fused mode computes it on device
        # INSIDE the sweep program, the streaming mode on host via sklearn —
        # same math, float-path differences only
        for split in ("zero_shot_train", "zero_shot_val", "zero_shot_test"):
            for k in ("loss", "acc", "auc"):
                assert abs(fused[split][k] - stream[split][k]) < 1e-4, (
                    split, k, fused[split], stream[split])
        # both modes write the checkpoint the result JSON points at
        for d in (fused_dir, stream_dir):
            assert os.path.exists(os.path.join(
                d, "1_shot", f"best_model_shot_1_fold_{fold}.msgpack"))
    assert os.path.exists(os.path.join(fused_dir, "summary_1.csv"))


@pytest.mark.slow
def test_train_mil_cli_vila(tmp_path):
    out = str(tmp_path / "vila_run")
    r = _run_cli(["moc_tpu.cli.train_mil", "--dataset", "synthetic",
                  "--model_type", "vila", "--shot", "2", "--fold", "0",
                  "--max_epochs", "2", "--lr", "1e-3", "--result_dir", out])
    assert r.returncode == 0, r.stderr[-3000:]
    payload = json.load(open(os.path.join(out, "vila_shot_2_fold_0.json")))
    assert {"val_auc", "test_auc", "test_acc", "stop_epoch"} <= set(payload)
    assert os.path.exists(os.path.join(out, "vila_shot_2_fold_0.msgpack"))


@pytest.mark.slow
def test_predict_cli(tmp_path):
    """Standalone prediction: senet msgpack + weight npz pair + feature dir
    -> per-slide probability CSV with metrics when labels are present."""
    import pandas as pd

    from moc_tpu.cli.predict import main as predict_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.utils.checkpoint import save_params

    root = tmp_path / "corpus"
    cfg_data = SyntheticWSIConfig(slides_per_class=5, min_patches=120,
                                  max_patches=300, dim=64, seed=3, signal=0.9)
    corpus = make_synthetic_corpus(str(root), cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=2)
    # restate the corpus as an NSCLC-labeled cohort (LUAD/LUSC)
    frame = pd.read_csv(corpus["csv_path"], dtype=str)
    frame["label"] = frame["label"].map({"0": "LUAD", "1": "LUSC"})
    csv_path = str(tmp_path / "cohort.csv")
    frame.to_csv(csv_path, index=False)

    np.savez(tmp_path / "w.npz", weights=corpus["weights"])
    np.savez(tmp_path / "we.npz", weights=corpus["weights_ext"])
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, feature_dim=64)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    model_path = str(tmp_path / "model.msgpack")
    save_params(model_path, params)

    out = str(tmp_path / "pred.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", model_path, "--feature_dir", corpus["data_dir"],
                       "--csv", csv_path, "--weights_npz", str(tmp_path / "w.npz"),
                       "--weights_ext_npz", str(tmp_path / "we.npz"),
                       "--topj", "32", "--out", out])
    assert rc == 0
    got = pd.read_csv(out)
    assert len(got) == 10
    assert {"slide_id", "pred", "label", "prob_0", "prob_1"} <= set(got.columns)
    np.testing.assert_allclose(got[["prob_0", "prob_1"]].sum(axis=1), 1.0,
                               atol=1e-5)
    # oracle zero-shot weights separate the synthetic corpus even untrained
    assert (got["pred"] == got["label"]).mean() >= 0.8

    # a trained MIL head serves through the same CLI (--model_kind mil)
    from moc_tpu.train import MilTrainConfig, build_model

    mil_cfg = MilTrainConfig(model_type="abmil", model_size="small", n_classes=2)
    _, _, init_fn = build_model(mil_cfg)
    mil_params = init_fn(jax.random.PRNGKey(0), jnp.zeros((8, 64)),
                         jnp.ones((8,), bool))
    mil_path = str(tmp_path / "mil.msgpack")
    save_params(mil_path, mil_params)
    out_mil = str(tmp_path / "pred_mil.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", mil_path, "--model_kind", "mil",
                       "--model_type", "abmil", "--model_size", "small",
                       "--feature_dir", corpus["data_dir"], "--csv", csv_path,
                       "--out", out_mil])
    assert rc == 0
    got_mil = pd.read_csv(out_mil)
    assert len(got_mil) == 10 and {"prob_0", "prob_1"} <= set(got_mil.columns)

    # bf16-resident serving tier: same slides, quantized features — the
    # hard predictions must match the f32 run on this well-separated corpus
    # and the probabilities stay close (inputs are quantized, not the math)
    out_bf16 = str(tmp_path / "pred_bf16.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", model_path, "--feature_dir", corpus["data_dir"],
                       "--csv", csv_path, "--weights_npz", str(tmp_path / "w.npz"),
                       "--weights_ext_npz", str(tmp_path / "we.npz"),
                       "--topj", "32", "--storage_dtype", "bfloat16",
                       "--score_dtype", "bfloat16", "--out", out_bf16])
    assert rc == 0
    got_bf16 = pd.read_csv(out_bf16).set_index("slide_id")
    ref = got.set_index("slide_id").loc[got_bf16.index]
    assert (got_bf16["pred"] == ref["pred"]).all()
    np.testing.assert_allclose(got_bf16[["prob_0", "prob_1"]],
                               ref[["prob_0", "prob_1"]], atol=0.05)

    # int8-resident serving tier (W8A8 dynamic quant): same contract
    out_int8 = str(tmp_path / "pred_int8.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", model_path, "--feature_dir", corpus["data_dir"],
                       "--csv", csv_path, "--weights_npz", str(tmp_path / "w.npz"),
                       "--weights_ext_npz", str(tmp_path / "we.npz"),
                       "--topj", "32", "--storage_dtype", "int8",
                       "--out", out_int8])
    assert rc == 0
    got_int8 = pd.read_csv(out_int8).set_index("slide_id")
    ref8 = got.set_index("slide_id").loc[got_int8.index]
    assert (got_int8["pred"] == ref8["pred"]).all()
    np.testing.assert_allclose(got_int8[["prob_0", "prob_1"]],
                               ref8[["prob_0", "prob_1"]], atol=0.05)

    # ...but a MIL head rejects the int8 tier loudly (no float formulation)
    with pytest.raises(SystemExit):
        predict_main(["--platform", "cpu", "--dataset", "nsclc",
                      "--model", mil_path, "--model_kind", "mil",
                      "--model_type", "abmil", "--model_size", "small",
                      "--feature_dir", corpus["data_dir"], "--csv", csv_path,
                      "--storage_dtype", "int8",
                      "--out", str(tmp_path / "nope.csv")])

    # --data_parallel shards each batch over the 8-device CPU mesh; results
    # must be identical to the single-device run (batch_size 6 exercises the
    # round-up to 8; 10 slides exercise the filler-padded final batch)
    out_dp = str(tmp_path / "pred_dp.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", model_path, "--feature_dir", corpus["data_dir"],
                       "--csv", csv_path, "--weights_npz", str(tmp_path / "w.npz"),
                       "--weights_ext_npz", str(tmp_path / "we.npz"),
                       "--topj", "32", "--batch_size", "6", "--data_parallel",
                       "--out", out_dp])
    assert rc == 0
    got_dp = pd.read_csv(out_dp).set_index("slide_id").sort_index()
    ref_dp = got.set_index("slide_id").sort_index()
    assert (got_dp["pred"] == ref_dp["pred"]).all()
    np.testing.assert_allclose(got_dp[["prob_0", "prob_1"]],
                               ref_dp[["prob_0", "prob_1"]], atol=1e-5)

    # unlabeled cohort: same CSV minus the label column -> no metrics, no crash
    frame.drop(columns=["label"]).to_csv(csv_path, index=False)
    out2 = str(tmp_path / "pred2.csv")
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", model_path, "--feature_dir", corpus["data_dir"],
                       "--csv", csv_path, "--weights_npz", str(tmp_path / "w.npz"),
                       "--weights_ext_npz", str(tmp_path / "we.npz"),
                       "--topj", "32", "--out", out2])
    assert rc == 0
    got2 = pd.read_csv(out2)
    assert "label" not in got2.columns and len(got2) == 10


@pytest.mark.slow
def test_train_mil_cli_multi_fold_summary(tmp_path):
    """--shots/--folds trains a grid in one invocation and writes the
    mean-row summary CSV (the reference's 5-fold statistical protocol)."""
    import pandas as pd

    out = str(tmp_path / "mil_sweep")
    r = _run_cli(["moc_tpu.cli.train_mil", "--dataset", "synthetic",
                  "--model_type", "mil", "--shots", "2", "--folds", "0", "1",
                  "--max_epochs", "2", "--result_dir", out], timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    for fold in (0, 1):
        assert os.path.exists(os.path.join(out, f"mil_shot_2_fold_{fold}.json"))
    frame = pd.read_csv(os.path.join(out, "mil_summary_2.csv"))
    assert list(frame["fold"]) == ["0", "1", "mean"]
    assert {"val_auc", "test_auc", "test_acc", "test_bacc"} <= set(frame.columns)


def test_extract_features_debug_pipeline(tmp_path):
    """Raw patch h5 → extract_features (debug backbone) → BagLoader-readable
    bag: the native replacement for the reference's external CLAM extraction
    step, end-to-end without model weights."""
    import h5py

    from moc_tpu.cli import extract_features as ef
    from moc_tpu.data.bags import read_bag_h5

    patch_dir = tmp_path / "patches" / "h5_files"
    patch_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    counts = {"s1": 7, "s2": 130}  # 130 > batch 64: exercises tail padding
    for slide, n in counts.items():
        with h5py.File(patch_dir / f"{slide}.h5", "w") as f:
            f.create_dataset("imgs", data=(rng.random((n, 64, 64, 3)) * 255)
                             .astype(np.uint8))
            f.create_dataset("coords", data=rng.integers(0, 10_000, (n, 2))
                             .astype(np.int32))

    out = tmp_path / "features"
    rc = ef.main(["--patch_dir", str(tmp_path / "patches"),
                  "--out_dir", str(out), "--backbone", "debug",
                  "--batch_size", "64", "--platform", "cpu"])
    assert rc == 0
    for slide, n in counts.items():
        bag = read_bag_h5(str(out / "h5_files" / f"{slide}.h5"))
        assert bag.features.shape == (n, 512) and bag.coords.shape == (n, 2)
        assert np.isfinite(bag.features).all()
        np.testing.assert_allclose(np.linalg.norm(bag.features, axis=1), 1.0,
                                   atol=1e-5)

    # deterministic + resume-aware: rerun with --resume touches nothing
    before = {s: os.path.getmtime(out / "h5_files" / f"{s}.h5") for s in counts}
    rc = ef.main(["--patch_dir", str(tmp_path / "patches"),
                  "--out_dir", str(out), "--backbone", "debug",
                  "--batch_size", "64", "--resume", "--platform", "cpu"])
    assert rc == 0
    after = {s: os.path.getmtime(out / "h5_files" / f"{s}.h5") for s in counts}
    assert before == after

    # --data_parallel shards each image batch over the 8-device CPU mesh;
    # embeddings must be identical to the single-device run (batch_size 60
    # exercises the round-up to a device-count multiple)
    out_dp = tmp_path / "features_dp"
    rc = ef.main(["--patch_dir", str(tmp_path / "patches"),
                  "--out_dir", str(out_dp), "--backbone", "debug",
                  "--batch_size", "60", "--data_parallel",
                  "--platform", "cpu"])
    assert rc == 0
    for slide in counts:
        ref = read_bag_h5(str(out / "h5_files" / f"{slide}.h5"))
        got = read_bag_h5(str(out_dp / "h5_files" / f"{slide}.h5"))
        np.testing.assert_allclose(got.features, ref.features, atol=1e-6)
        np.testing.assert_array_equal(got.coords, ref.coords)


def test_serve_shard_ownership():
    """Watch-mode pod sharding: hash ownership is deterministic, disjoint,
    complete, and roughly balanced (Python hash() is salted per process —
    this must NOT be)."""
    from moc_tpu.cli.serve import _shard_owns

    ids = [f"slide_{i:04d}" for i in range(300)]
    owned = [{s for s in ids if _shard_owns(s, (p, 3))} for p in range(3)]
    assert set().union(*owned) == set(ids)
    assert sum(len(o) for o in owned) == len(ids)  # disjoint
    assert all(50 <= len(o) <= 150 for o in owned), [len(o) for o in owned]
    assert owned[0] == {s for s in ids if _shard_owns(s, (0, 3))}  # stable
    assert all(_shard_owns(s, None) for s in ids)


@pytest.mark.slow
def test_serve_cli(tmp_path):
    """Serving daemon: watch mode drains a backlog into the CSV once
    (restart-idempotent), picks up late-arriving bags, and the stdin
    protocol answers per line — errors reported inline, not fatal."""
    import pandas as pd

    from moc_tpu.cli import serve
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.utils.checkpoint import save_params

    root = tmp_path / "corpus"
    cfg_data = SyntheticWSIConfig(slides_per_class=4, min_patches=120,
                                  max_patches=300, dim=64, seed=5, signal=0.9)
    corpus = make_synthetic_corpus(str(root), cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=1)
    np.savez(tmp_path / "w.npz", weights=corpus["weights"])
    np.savez(tmp_path / "we.npz", weights=corpus["weights_ext"])
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, feature_dim=64)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    model_path = str(tmp_path / "model.msgpack")
    save_params(model_path, params)

    out = str(tmp_path / "served.csv")
    base = ["--platform", "cpu", "--dataset", "nsclc", "--model", model_path,
            "--weights_npz", str(tmp_path / "w.npz"),
            "--weights_ext_npz", str(tmp_path / "we.npz"),
            "--topj", "32", "--out", out,
            "--watch_dir", corpus["data_dir"], "--once"]
    assert serve.main(base) == 0
    got = pd.read_csv(out)
    assert len(got) == 8  # 4/class
    assert {"slide_id", "pred", "prob_0", "prob_1"} <= set(got.columns)

    # restart over the same dir: nothing new, no duplicate rows
    assert serve.main(base) == 0
    assert len(pd.read_csv(out)) == 8

    # a bag that arrives later is picked up on the next drain
    h5s = sorted(glob.glob(os.path.join(corpus["data_dir"], "h5_files", "*.h5")))
    import shutil

    new_bag = os.path.join(corpus["data_dir"], "h5_files", "late_slide.h5")
    shutil.copy(h5s[0], new_bag)
    assert serve.main(base) == 0
    got = pd.read_csv(out)
    assert len(got) == 9 and "late_slide" in set(got["slide_id"])
    # the copy must score identically to its source
    src = os.path.splitext(os.path.basename(h5s[0]))[0]
    a = got[got.slide_id == src].iloc[0]
    b = got[got.slide_id == "late_slide"].iloc[0]
    assert a["pred"] == b["pred"]
    np.testing.assert_allclose(a[["prob_0", "prob_1"]].astype(float),
                               b[["prob_0", "prob_1"]].astype(float), atol=1e-5)

    # stdin protocol: one JSON-able dict per line; bad lines stay non-fatal
    args = serve.get_args(base[:-3] + ["--from_stdin",
                                       "--feature_dir", corpus["data_dir"]])
    serve.setup_runtime(args)
    server = serve.Server(args)
    lines = [h5s[0], src, "missing_slide", ""]
    results = list(serve.serve_stream(server, lines, corpus["data_dir"]))
    assert len(results) == 3  # blank line skipped
    assert results[0]["pred"] == results[1]["pred"] == int(a["pred"])
    assert "error" in results[2]

    # the int8-resident tier serves the same predictions on this
    # well-separated corpus (quantized inputs, exact int32 accumulation)
    args8 = serve.get_args(base[:-3] + ["--from_stdin", "--storage_dtype",
                                        "int8", "--feature_dir",
                                        corpus["data_dir"]])
    serve.setup_runtime(args8)
    server8 = serve.Server(args8)
    r8 = list(serve.serve_stream(server8, [h5s[0]], corpus["data_dir"]))
    assert r8[0]["pred"] == int(a["pred"])
    np.testing.assert_allclose(
        [r8[0]["prob_0"], r8[0]["prob_1"]],
        a[["prob_0", "prob_1"]].astype(float), atol=0.05)


@pytest.mark.slow
def test_sweep_cli_device_pool_cache_reuse(tmp_path, monkeypatch):
    """Two in-process fused-sweep invocations over the same corpus: the
    second must HIT the device-resident pool cache (utils.device_cache) —
    no re-transfer — and write bit-equal result files. Serving loops and
    bench draws rely on this."""
    import moc_tpu.utils.device_cache as dc
    from moc_tpu.cli import sweep as sweep_cli

    calls = {"hit": 0, "miss": 0}
    real = dc.device_put_cached

    def counting(*arrays, extra=b""):
        out, hit = real(*arrays, extra=extra)
        calls["hit" if hit else "miss"] += 1
        return out, hit

    # the CLI resolves the symbol at call time through the module
    monkeypatch.setattr(dc, "device_put_cached", counting)
    dc.clear_device_cache()
    base = ["--dataset", "synthetic", "--shots", "1", "--folds", "0",
            "--topj", "32", "--topk", "10", "--num_epochs", "2",
            "--mode", "fused", "--platform", "cpu"]
    dirs = [str(tmp_path / "a"), str(tmp_path / "b")]
    for d in dirs:
        assert sweep_cli.main(base + ["--result_dir", d]) == 0
    assert calls == {"miss": 1, "hit": 1}, calls

    a = json.load(open(os.path.join(dirs[0], "1_shot", "best_results_shot_1_fold_0.json")))
    b = json.load(open(os.path.join(dirs[1], "1_shot", "best_results_shot_1_fold_0.json")))
    for k in a:
        if k != "best_model_path":
            assert a[k] == b[k], (k, a[k], b[k])
    dc.clear_device_cache()


@pytest.mark.slow
def test_sweep_cli_host_pool_cache(tmp_path, monkeypatch):
    """Cross-invocation host pool cache: a second sweep over the unchanged
    corpus skips the bag re-read/re-pack entirely (file-stat keyed), writes
    equal results, and any on-disk change (mtime bump) invalidates it."""
    from moc_tpu.cli import sweep as sweep_cli
    from moc_tpu.data.loader import BagLoader

    sweep_cli._HOST_POOL_CACHE.clear()
    d = str(tmp_path / "r")
    res = os.path.join(d, "1_shot", "best_results_shot_1_fold_0.json")
    base = ["--dataset", "synthetic", "--shots", "1", "--folds", "0",
            "--topj", "32", "--topk", "10", "--num_epochs", "2",
            "--mode", "fused", "--platform", "cpu", "--result_dir", d]
    assert sweep_cli.main(base) == 0
    first = json.load(open(res))

    reads = {"n": 0}
    real = BagLoader.read_all

    def counting(self, ids=None):
        reads["n"] += 1
        return real(self, ids)

    monkeypatch.setattr(BagLoader, "read_all", counting)
    assert sweep_cli.main(base) == 0  # same files: cache hit, zero reads
    assert reads["n"] == 0, reads
    second = json.load(open(res))
    for k in first:
        assert first[k] == second[k], (k, first[k], second[k])

    # bump one bag file's mtime: the stat key changes, the pool re-reads
    corpus = os.path.join(d, "synthetic_corpus")
    h5s = sorted(glob.glob(os.path.join(corpus, "features", "h5_files", "*.h5")))
    assert h5s
    os.utime(h5s[0], ns=(1, 1))
    assert sweep_cli.main(base) == 0
    assert reads["n"] == 1, reads
    sweep_cli._HOST_POOL_CACHE.clear()


def test_score_bags_merges_buckets_under_min_pad():
    """min_pad clamps bucket keys BEFORE grouping: slides below an exported
    program's floor pack into the floor bucket's batches instead of running
    extra part-filled forwards at the same padded shape."""
    from moc_tpu.cli.predict import score_bags
    from moc_tpu.data.bags import Bag

    rng = np.random.default_rng(0)
    bags = [Bag(slide_id=f"s{i}", label=0, coords=None,
                features=rng.normal(size=(n, 8)).astype(np.float32))
            for i, n in enumerate([100] * 7 + [900] * 7)]  # buckets 512+1024
    calls = []

    def fake_logits(params, batch):
        calls.append(tuple(batch.features.shape))
        return np.zeros((batch.features.shape[0], 2), np.float32)

    rows = score_bags(fake_logits, None, bags, batch_size=8, n_classes=2,
                      temperature=1.0, dtype=jnp.float32, min_pad=1024)
    assert len(rows) == 14
    assert len(calls) == 2, calls  # merged: 14 slides / batch 8 -> 2 batches
    assert all(s[1] == 1024 for s in calls), calls
    # without a floor the buckets stay separate (unchanged behavior)
    calls.clear()
    score_bags(fake_logits, None, bags, batch_size=8, n_classes=2,
               temperature=1.0, dtype=jnp.float32, min_pad=0)
    assert sorted(s[1] for s in calls) == [512, 1024]


def test_parse_warmup():
    """--warmup tolerates shell-templating junk and fails as a usage error,
    never a traceback."""
    from moc_tpu.cli.serve import _parse_warmup

    assert _parse_warmup("2048,4096") == [2048, 4096]
    assert _parse_warmup("2048, 4096,") == [2048, 4096]
    with pytest.raises(SystemExit):
        _parse_warmup("2048,abc")
    with pytest.raises(SystemExit):
        _parse_warmup(",")


def test_pod_launch_kills_siblings_on_failure():
    """pod_launch.sh: a rank that dies at startup must not leave siblings
    blocked forever (torchrun-style group teardown + nonzero exit)."""
    import time

    script = os.path.join(REPO, "scripts", "pod_launch.sh")
    t0 = time.time()
    proc = subprocess.run(
        [script, "2", "--", "sh", "-c",
         'if [ "$MOC_TPU_PROCESS_ID" = "0" ]; then sleep 300; else exit 3; fi'],
        timeout=120, capture_output=True)
    assert proc.returncode != 0
    assert time.time() - t0 < 60


def test_pretrain_cli_resume(tmp_path):
    """cli.pretrain runs the sharded masked-token step on a dp×tp mesh,
    checkpoints, and a re-invocation resumes from the latest step (the
    reference's torchscale stack has NO launchable pretrain and no resume,
    SURVEY §5.3)."""
    from moc_tpu.cli.pretrain import main as pretrain_main, parse_mesh_arg

    assert parse_mesh_arg("data=4,tensor=2") == {"data": 4, "tensor": 2}
    with pytest.raises(ValueError):
        parse_mesh_arg("data")

    ckpt = str(tmp_path / "ckpt")
    base = ["--platform", "cpu", "--batch", "8", "--seq_len", "16",
            "--vocab", "64", "--layers", "2", "--embed_dim", "32",
            "--ffn_dim", "64", "--heads", "4", "--mesh", "data=4,tensor=2",
            "--ckpt_dir", ckpt, "--ckpt_every", "2", "--log_every", "1"]
    assert pretrain_main(base + ["--steps", "4"]) == 0
    from moc_tpu.utils.checkpoint import latest_step

    assert latest_step(ckpt) == 4
    # resume: only 2 more steps run; checkpoint advances to 6
    assert pretrain_main(base + ["--steps", "6"]) == 0
    assert latest_step(ckpt) == 6
    # already-current checkpoint: clean no-op
    assert pretrain_main(base + ["--steps", "6"]) == 0


def test_pretrain_cli_corpus_and_moe(tmp_path):
    """--corpus windows a real token array (id-range validated against the
    [MASK] slot) and --moe_experts swaps FFNs for the GShard MoE over the
    expert axis."""
    import numpy as np

    from moc_tpu.cli.pretrain import main as pretrain_main

    rng = np.random.default_rng(0)
    np.save(tmp_path / "tok.npy", rng.integers(0, 50, 4000, dtype=np.int32))
    base = ["--platform", "cpu", "--batch", "8", "--seq_len", "16",
            "--vocab", "64", "--layers", "2", "--embed_dim", "32",
            "--ffn_dim", "64", "--heads", "4", "--steps", "2",
            "--corpus", str(tmp_path / "tok.npy")]
    assert pretrain_main(base + ["--mesh", "data=-1"]) == 0
    assert pretrain_main(base + ["--mesh", "data=2,expert=4",
                                 "--moe_experts", "4", "--moe_freq", "2"]) == 0
    # corpus ids colliding with the [MASK] slot is a usage error
    np.save(tmp_path / "bad.npy", np.full(100, 63, np.int32))
    with pytest.raises(SystemExit):
        pretrain_main(base[:-1] + [str(tmp_path / "bad.npy")])


@pytest.mark.slow
def test_sweep_cli_fused_matches_stream_multiclass(tmp_path):
    """3-class (RCC-shaped) sweep end-to-end: the fused path's device ovo
    AUC, per-class zero-shot floor, and best-val selection agree with the
    streaming host path — multiclass certified through the full CLI, not
    just the metric unit tests."""
    base = ["moc_tpu.cli.sweep", "--dataset", "synthetic",
            "--synthetic_classes", "3", "--shots", "1", "--folds", "0",
            "--synthetic_min_patches", "60", "--synthetic_max_patches", "90",
            "--topj", "24", "--topk", "10", "--num_epochs", "2"]
    fused_dir = str(tmp_path / "fused")
    r = _run_cli(base + ["--result_dir", fused_dir, "--mode", "fused"],
                 timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    stream_dir = str(tmp_path / "stream")
    r2 = _run_cli(base + ["--result_dir", stream_dir, "--mode", "stream"],
                  timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]

    fused = json.load(open(os.path.join(
        fused_dir, "1_shot", "best_results_shot_1_fold_0.json")))
    stream = json.load(open(os.path.join(
        stream_dir, "1_shot", "best_results_shot_1_fold_0.json")))
    assert fused["best_epoch"] == stream["best_epoch"]
    for key in ("best_val", "test_at_best_val", "test_acc_at_best_val"):
        assert abs(fused[key] - stream[key]) < 1e-4, (key, fused, stream)
    for split in ("zero_shot_train", "zero_shot_val", "zero_shot_test"):
        for k in ("loss", "acc", "auc"):
            assert abs(fused[split][k] - stream[split][k]) < 1e-4, (
                split, k, fused[split], stream[split])


def test_predict_model_type_from_sidecar(tmp_path):
    """--model_kind mil without --model_type reads the architecture from
    the sidecar JSON train_mil writes beside the msgpack; without a sidecar
    it is a clear usage error (never a silent wrong-architecture default)."""
    import jax
    import jax.numpy as jnp

    from moc_tpu.cli.predict import main as predict_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.train import MilTrainConfig, build_model
    from moc_tpu.utils.checkpoint import save_params

    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"),
        SyntheticWSIConfig(slides_per_class=3, min_patches=40,
                           max_patches=70, dim=64, seed=11, signal=0.9),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)
    import pandas as pd

    frame = pd.read_csv(corpus["csv_path"], dtype=str)
    frame["label"] = frame["label"].map({"0": "LUAD", "1": "LUSC"})
    csv_path = str(tmp_path / "cohort.csv")
    frame.to_csv(csv_path, index=False)

    cfg = MilTrainConfig(model_type="chief", model_size="small", n_classes=2)
    _, _, init_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0), jnp.zeros((8, 64)),
                     jnp.ones((8,), bool))
    path = str(tmp_path / "chief_shot_1_fold_0.msgpack")
    save_params(path, params)
    with open(path.replace(".msgpack", ".json"), "w") as f:
        json.dump({"test_auc": 0.9, "model_type": "chief",
                   "model_size": "small", "n_classes": 2}, f)

    out = str(tmp_path / "pred.csv")
    assert predict_main(["--platform", "cpu", "--dataset", "nsclc",
                         "--model", path, "--model_kind", "mil",
                         "--feature_dir", corpus["data_dir"],
                         "--csv", csv_path, "--out", out]) == 0
    import numpy as np

    got = pd.read_csv(out)
    assert len(got) == 6
    np.testing.assert_allclose(got[["prob_0", "prob_1"]].sum(axis=1), 1.0,
                               atol=1e-5)

    # no sidecar, no flag -> usage error
    bare = str(tmp_path / "bare.msgpack")
    save_params(bare, params)
    with pytest.raises(SystemExit, match="model_type"):
        predict_main(["--platform", "cpu", "--dataset", "nsclc",
                      "--model", bare, "--model_kind", "mil",
                      "--feature_dir", corpus["data_dir"],
                      "--csv", csv_path, "--out", out])


def test_watch_once_retries_partial_files(tmp_path):
    """A bag that is mid-copy (unreadable) must be RETRIED on later polls —
    scored once the copy completes — and only written off after
    MAX_READ_RETRIES consecutive failures."""
    import numpy as np

    from moc_tpu.cli.serve import MAX_READ_RETRIES, watch_once
    from moc_tpu.data.bags import write_bag_h5

    class FakeServer:
        def score(self, bags, batch_size=None):
            return [{"slide_id": b.slide_id, "prob_0": 0.5, "prob_1": 0.5}
                    for b in bags]

    watch = tmp_path / "watch"
    watch.mkdir()
    # a good bag and a truncated (mid-copy) one
    write_bag_h5(str(watch / "good.h5"), np.zeros((4, 8), np.float32),
                 np.zeros((4, 2), np.int32))
    (watch / "partial.h5").write_bytes(b"\x89HDF-not-really")

    out = str(tmp_path / "out.csv")
    seen: set = set()
    failures: dict = {}
    n = watch_once(FakeServer(), str(watch), out, seen, failures=failures)
    assert n == 1 and "good" in seen
    assert "partial" not in seen and failures["partial"] == 1

    # the copy completes between polls -> next poll scores it
    write_bag_h5(str(watch / "partial.h5"), np.zeros((3, 8), np.float32),
                 np.zeros((3, 2), np.int32))
    n = watch_once(FakeServer(), str(watch), out, seen, failures=failures)
    assert n == 1 and "partial" in seen and "partial" not in failures

    # a genuinely corrupt file is written off after MAX_READ_RETRIES
    (watch / "corrupt.h5").write_bytes(b"junk")
    for attempt in range(1, MAX_READ_RETRIES + 1):
        watch_once(FakeServer(), str(watch), out, seen, failures=failures)
        if attempt < MAX_READ_RETRIES:
            assert "corrupt" not in seen and failures["corrupt"] == attempt
    assert "corrupt" in seen  # no infinite retry loop
    import pandas as pd

    got = pd.read_csv(out)
    assert sorted(got["slide_id"]) == ["good", "partial"]


def test_watch_once_isolates_poison_bags(tmp_path):
    """A READABLE bag the model rejects (wrong feature dim) must not kill
    the daemon or poison its batch: the batch falls back to per-bag
    scoring, good neighbors still land in the CSV, and the offender is
    written off after MAX_READ_RETRIES (not retried forever, not crashed
    on at every restart)."""
    import numpy as np
    import pandas as pd

    from moc_tpu.cli.serve import MAX_READ_RETRIES, watch_once
    from moc_tpu.data.bags import write_bag_h5

    class DimCheckingServer:
        def score(self, bags, batch_size=None):
            for b in bags:
                if b.features.shape[1] != 8:
                    raise ValueError(
                        f"feature dim {b.features.shape[1]} != 8")
            return [{"slide_id": b.slide_id, "prob_0": 0.5, "prob_1": 0.5}
                    for b in bags]

    watch = tmp_path / "watch"
    watch.mkdir()
    write_bag_h5(str(watch / "good.h5"), np.zeros((4, 8), np.float32),
                 np.zeros((4, 2), np.int32))
    write_bag_h5(str(watch / "poison.h5"), np.zeros((4, 16), np.float32),
                 np.zeros((4, 2), np.int32))

    out = str(tmp_path / "out.csv")
    seen: set = set()
    failures: dict = {}
    # first poll: the whole-batch score raises; fallback isolates the
    # poison bag, the good one is still scored
    n = watch_once(DimCheckingServer(), str(watch), out, seen,
                   failures=failures)
    assert n == 1 and "good" in seen
    assert "poison" not in seen and failures["poison"] == 1
    for attempt in range(2, MAX_READ_RETRIES + 1):
        watch_once(DimCheckingServer(), str(watch), out, seen,
                   failures=failures)
    assert "poison" in seen  # written off: restarts won't crash on it
    got = pd.read_csv(out)
    assert list(got["slide_id"]) == ["good"]
