"""Request-level serve-latency A/B across storage tiers (f32/bf16/int8).

VERDICT r3 weak #4: the session-3 p50 table (f32 186 → bf16 121 → int8
101 ms) was measured BEFORE the native single-pass quantizer landed in the
pack path (``native.quantize_rows_i8``, commit 8f20352); the host-quant
cost baked into DEPLOY's per-rig guidance is stale. This reruns the same
protocol: ``cli.serve`` stdin mode, warm daemon, 1500-4000-patch bags
(D=512, ~3-8 MB/bag f32), per-request wall clock, p50/p90 per tier.

Run alone on the chip: ``python scripts/serve_p50_ab.py``
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


N_REQ = 30


def main():
    import shutil

    from moc_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="serve_ab_")
    try:
        _run(root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _run(root):
    import jax

    from moc_tpu.cli import serve
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.utils.checkpoint import save_params

    cfg_data = SyntheticWSIConfig(slides_per_class=8, min_patches=1500,
                                  max_patches=4000, dim=512, seed=3,
                                  signal=0.9)
    log("generating corpus (16 bags, 1500-4000 patches, D=512)...")
    corpus = make_synthetic_corpus(root, cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=1)
    np.savez(f"{root}/w.npz", weights=corpus["weights"])
    np.savez(f"{root}/we.npz", weights=corpus["weights_ext"])
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, feature_dim=512)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)
    save_params(f"{root}/model.msgpack", params)

    import glob

    h5s = sorted(glob.glob(f"{root}/features/h5_files/*.h5"))
    reqs = [h5s[i % len(h5s)] for i in range(N_REQ)]

    results = {"protocol": f"cli.serve stdin, warm daemon, {N_REQ} requests, "
                           "1500-4000-patch bags D=512", "tiers": {}}
    for tier in ("float32", "bfloat16", "int8"):
        args = serve.get_args([
            "--dataset", "nsclc", "--model", f"{root}/model.msgpack",
            "--weights_npz", f"{root}/w.npz",
            "--weights_ext_npz", f"{root}/we.npz",
            "--from_stdin", "--feature_dir", f"{root}/features",
            "--storage_dtype", tier, "--out", f"{root}/out_{tier}.csv"])
        serve.setup_runtime(args)
        server = serve.Server(args)
        # warm: every bucket the 1500-4000 range hits (2048, 4096)
        for line in h5s[:4]:
            list(serve.serve_stream(server, [line], f"{root}/features"))
        lat = []
        for line in reqs:
            t0 = time.perf_counter()
            out = list(serve.serve_stream(server, [line], f"{root}/features"))
            lat.append(time.perf_counter() - t0)
            assert "error" not in out[0], out[0]
        lat_ms = np.array(lat) * 1e3
        row = {"p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
               "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
               "min_ms": round(float(lat_ms.min()), 1),
               "max_ms": round(float(lat_ms.max()), 1)}
        results["tiers"][tier] = row
        log(f"{tier}: {row}")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
