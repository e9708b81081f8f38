"""AOT serving-program export (``utils.export`` + CLI wiring).

The deployable-artifact path the reference lacks entirely: the compiled
scoring closure (params + weight matrices baked in) serialized via
``jax.export`` with a SYMBOLIC padded-patch dimension, reloaded with no
model code, and required to match the live path bit-for-bit across bucket
sizes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _toy_setup(rng):
    from moc_tpu.data.bags import Bag
    from moc_tpu.moc import MOCConfig, init_senet, make_episode_fns

    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=32, topk=4,
                    feature_dim=64)
    _, eval_batch, _ = make_episode_fns(cfg)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))

    def batch_logits(p, batch):
        return eval_batch(p, batch, w, we)

    bags = [Bag(slide_id=f"s{i}", label=0, coords=None,
                features=rng.normal(size=(n, 64)).astype(np.float32))
            for i, n in enumerate([100, 150, 90, 120])]
    return batch_logits, params, bags


def test_roundtrip_symbolic_pad(tmp_path):
    """One artifact serves every padded length >= min_pad, bit-identically
    to the live jitted path; metadata round-trips."""
    from moc_tpu.data.batching import pack_bags
    from moc_tpu.utils.export import (load_serving_program,
                                      save_serving_program)

    rng = np.random.default_rng(0)
    batch_logits, params, bags = _toy_setup(rng)
    path = str(tmp_path / "program.npz")
    meta = save_serving_program(
        path, batch_logits, params, batch_size=4, feature_dim=64,
        min_pad=256, meta=dict(temperature=56.3477, n_classes=2))
    assert meta["platforms"] == ["cpu", "tpu"] and meta["dtype"] == "float32"

    prog = load_serving_program(path)
    assert prog.meta["temperature"] == pytest.approx(56.3477)
    for n_pad in (256, 512):  # two bucket sizes, one artifact
        batch = pack_bags(bags, n_pad=n_pad, device_put=False)
        live = batch_logits(params, batch)
        from_artifact = prog.batch_logits(None, batch)
        np.testing.assert_array_equal(np.asarray(from_artifact),
                                      np.asarray(live))
    # below the baked-in floor the artifact must refuse, not mis-score
    with pytest.raises(Exception):
        prog.call(np.zeros((4, 128, 64), np.float32),
                  np.ones((4, 128), bool))


def test_mil_heads_export(tmp_path):
    """MIL heads export too (abmil within compile-fusion float tolerance);
    transmil's square-padding host math can't go symbolic and must be
    rejected with a clear error, not a bare trace failure."""
    from moc_tpu.data.bags import Bag
    from moc_tpu.data.batching import pack_bags
    from moc_tpu.train import MilTrainConfig, build_model
    from moc_tpu.utils.export import (load_serving_program,
                                      save_serving_program)

    rng = np.random.default_rng(2)

    def make(model_type):
        cfg = MilTrainConfig(model_type=model_type, model_size="small",
                             n_classes=2)
        _, forward, init_fn = build_model(cfg)
        params = init_fn(jax.random.PRNGKey(0), jnp.zeros((64, 512)),
                         jnp.ones((64,), bool))

        def batch_logits(p, batch):
            return jax.vmap(lambda f, v: forward(p, f, v, None)[0])(
                batch.features, batch.mask)

        return batch_logits, params

    batch_logits, params = make("abmil")
    path = str(tmp_path / "abmil.npz")
    save_serving_program(path, batch_logits, params, batch_size=2,
                         feature_dim=512, min_pad=128,
                         meta=dict(temperature=1.0, n_classes=2))
    bags = [Bag(slide_id=f"s{i}", label=0, coords=None,
                features=rng.normal(size=(n, 512)).astype(np.float32))
            for i, n in enumerate([70, 100])]
    prog = load_serving_program(path)
    for n_pad in (128, 200):
        batch = pack_bags(bags, n_pad=n_pad, device_put=False)
        np.testing.assert_allclose(np.asarray(prog.batch_logits(None, batch)),
                                   np.asarray(batch_logits(params, batch)),
                                   atol=1e-5)

    batch_logits, params = make("transmil")
    with pytest.raises(ValueError, match="symbolic|concrete"):
        save_serving_program(str(tmp_path / "t.npz"), batch_logits, params,
                             batch_size=2, feature_dim=512, min_pad=128,
                             meta=dict(temperature=1.0, n_classes=2))


def test_int8_tier_export(tmp_path):
    """The int8-resident serving tier exports with the (q, scales, mask)
    signature and matches the live W8A8 path exactly."""
    from moc_tpu.data.batching import pack_bags
    from moc_tpu.utils.export import (load_serving_program,
                                      save_serving_program)

    rng = np.random.default_rng(1)
    batch_logits, params, bags = _toy_setup(rng)
    path = str(tmp_path / "p.npz")
    save_serving_program(path, batch_logits, params, batch_size=4,
                         feature_dim=64, min_pad=256, dtype=jnp.int8,
                         meta=dict(temperature=56.3477, n_classes=2))
    prog = load_serving_program(path)
    assert prog.meta["dtype"] == "int8"
    for n_pad in (256, 512):
        batch = pack_bags(bags, n_pad=n_pad, dtype=jnp.int8,
                          device_put=False)
        assert batch.scales is not None
        live = batch_logits(params, batch)
        got = prog.batch_logits(None, batch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(live),
                                   atol=1e-5)


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """cli.predict --export_program -> --from_program and
    cli.serve --from_program reproduce the live CSV exactly."""
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

    base = ["--platform", "cpu", "--dataset", "nsclc",
            "--feature_dir", corpus["data_dir"], "--csv", csv_path,
            "--topj", "32"]
    live_out = str(tmp_path / "live.csv")
    assert predict_main(base + ["--model", model_path,
                                "--weights_npz", str(tmp_path / "w.npz"),
                                "--weights_ext_npz", str(tmp_path / "we.npz"),
                                "--out", live_out]) == 0

    program = str(tmp_path / "program.npz")
    assert predict_main(base + ["--model", model_path,
                                "--weights_npz", str(tmp_path / "w.npz"),
                                "--weights_ext_npz", str(tmp_path / "we.npz"),
                                "--export_program", program,
                                "--export_min_pad", "512"]) == 0
    assert os.path.exists(program)

    prog_out = str(tmp_path / "prog.csv")
    assert predict_main(base + ["--from_program", program,
                                "--out", prog_out]) == 0
    live = pd.read_csv(live_out).set_index("slide_id").sort_index()
    got = pd.read_csv(prog_out).set_index("slide_id").sort_index()
    assert (got["pred"] == live["pred"]).all()
    np.testing.assert_array_equal(got[["prob_0", "prob_1"]].to_numpy(),
                                  live[["prob_0", "prob_1"]].to_numpy())

    # serve daemon from the artifact: drain the corpus dir once, no --model
    from moc_tpu.cli.serve import main as serve_main

    served = str(tmp_path / "served.csv")
    assert serve_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--from_program", program, "--warmup", "512",
                       "--watch_dir", corpus["data_dir"], "--once",
                       "--out", served]) == 0
    srv = pd.read_csv(served).set_index("slide_id").sort_index()
    assert (srv["pred"] == live["pred"].loc[srv.index]).all()

    # a storage tier conflicting with the artifact's baked-in signature is
    # rejected up front (same rule as cli.predict), not silently ignored
    with pytest.raises(SystemExit, match="storage dtype"):
        serve_main(["--platform", "cpu", "--dataset", "nsclc",
                    "--from_program", program, "--storage_dtype", "int8",
                    "--watch_dir", corpus["data_dir"], "--once",
                    "--out", served])
