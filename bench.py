"""Benchmark: MOC slide-classification throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "moc_eval_slides_per_sec", "value": N, "unit": "slides/sec/chip",
   "vs_baseline": R}

Protocol (BASELINE.md): the reference instruments no timers, so the baseline
here is the same MOC algorithm (patch scoring → 4-policy selection → senet
fusion → top-k pooling) implemented in PyTorch, timed on this host's CPU —
i.e. the reference's per-slide eager pipeline without its GPU. ``vs_baseline``
is the ratio of the JAX/TPU batched-jit path over that torch path at the
reference operating point (topj=400, topk=10, D=512, C=2/Ce=6, ~16k patches).

Run: ``python bench.py`` (uses the real TPU when available; falls back to CPU).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


N_PATCHES = 16384
DIM = 512
N_CLASSES = 2
N_EXT = 6
TOPJ = 400
TOPK = 10
BATCH = 8
ITERS = 20


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from moc_tpu.moc import MOCConfig, make_episode_fns, init_senet
    from moc_tpu.data.batching import BagBatch

    dev = jax.devices()[0]
    log(f"jax backend: {dev.platform} ({dev.device_kind})")

    cfg = MOCConfig(n_classes=N_CLASSES, n_ext_classes=N_EXT, topj=TOPJ, topk=TOPK,
                    feature_dim=DIM)
    _, eval_batch, _ = make_episode_fns(cfg)
    _, params = init_senet(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(BATCH, N_PATCHES, DIM)).astype(np.float32)
    mask = np.ones((BATCH, N_PATCHES), bool)
    batch = BagBatch(
        features=jnp.asarray(feats),
        mask=jnp.asarray(mask),
        labels=jnp.zeros((BATCH,), jnp.int32),
        n_patches=jnp.full((BATCH,), N_PATCHES, jnp.int32),
    )
    w = jnp.asarray(rng.normal(size=(DIM, N_CLASSES)).astype(np.float32))
    w_ext = jnp.asarray(rng.normal(size=(DIM, N_EXT)).astype(np.float32))

    from moc_tpu.utils import device_time

    t0 = time.perf_counter()
    out = eval_batch(params, batch, w, w_ext)
    np.asarray(out.ravel()[:1])
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    # slope-timed (tunnel-latency corrected — see moc_tpu.utils.benchmark)
    # the tunnel's dispatch-side jitter is large; take the best slope of many
    # repeats so the recorded headline reflects device throughput, not host load
    t = device_time(lambda b: eval_batch(params, b, w, w_ext), batch,
                    iters=ITERS, repeats=8, reduce="median")
    sps = BATCH / t
    log(f"jax: {t * 1e3:.2f} ms/batch of {BATCH} -> {sps:.1f} slides/s")
    return sps


def bench_torch_cpu(n_slides: int = 3) -> float:
    """The reference's eager per-slide pipeline, re-stated in torch on CPU."""
    import torch

    torch.manual_seed(0)
    w = torch.randn(DIM, N_CLASSES)
    w_ext = torch.randn(DIM, N_EXT)
    senet = torch.nn.Sequential(
        torch.nn.Linear(DIM, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 4), torch.nn.Sigmoid(),
    )

    def one_slide(feat: torch.Tensor) -> torch.Tensor:
        logits = feat @ w
        logits_ext = feat @ w_ext
        j = min(TOPJ, feat.shape[0])
        sel = set()
        sel.update(torch.topk(logits, j, dim=0)[1].flatten().tolist())
        sel.update(torch.topk(logits.softmax(1), j, dim=0)[1].flatten().tolist())
        top2 = torch.topk(logits, 2, dim=1)[0]
        margin = (top2[:, 0] - top2[:, 1]).abs()
        sel.update(torch.topk(margin, j)[1].tolist())
        bg = logits_ext[:, N_CLASSES:].sum(1)
        bk = torch.topk(-bg, j)[1]
        sel.update(bk[torch.topk(logits_ext[bk, :N_CLASSES], min(j, len(bk)), dim=0)[1]]
                   .flatten().tolist())
        idx = torch.tensor(sorted(sel))
        sf = feat[idx]
        sl = sf @ w
        sle = sf @ w_ext
        views = torch.stack([
            sl, sl.softmax(1),
            (torch.topk(sl, 2, 1)[0][:, 0] - torch.topk(sl, 2, 1)[0][:, 1]).abs()
            .unsqueeze(1).expand_as(sl),
            sle[:, N_CLASSES:].max(1)[0].unsqueeze(1).expand_as(sl),
        ])
        wts = senet(sf)
        fused = (wts.t().unsqueeze(-1) * views).sum(0)
        k = min(TOPK, fused.shape[0])
        return torch.topk(fused, k, dim=0)[0].mean(0, keepdim=True)

    feats = [torch.randn(N_PATCHES, DIM) for _ in range(n_slides)]
    with torch.no_grad():
        one_slide(feats[0])  # warm
        # best-of-3 so transient host load doesn't skew the recorded ratio
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for f in feats:
                one_slide(f)
            dt = min(dt, time.perf_counter() - t0)
    sps = n_slides / dt
    log(f"torch-cpu baseline: {n_slides} slides in {dt:.3f}s (best of 3) -> {sps:.1f} slides/s")
    return sps


def bench_sweep_cli() -> dict:
    """Episode-sweep wallclock through the CLI-reachable fused path.

    Drives ``moc_tpu.cli.sweep`` (the code path users run) twice on the
    synthetic corpus — the first call generates the corpus and compiles, the
    second measures warm end-to-end wallclock (IO + zs floor + 25-epoch
    training + eval + result writing) per episode. 5 episodes = shot 2 ×
    folds {0..4}: ONE compiled fused program, bounding compile cost on a
    misbehaving tunnel.
    """
    import shutil
    import tempfile

    from moc_tpu.cli import sweep as sweep_cli

    root = tempfile.mkdtemp(prefix="moc_bench_sweep_")
    try:
        args = ["--dataset", "synthetic", "--shots", "2",
                "--folds", "0", "1", "2", "3", "4", "--topj", "400",
                "--topk", "10", "--num_epochs", "25",
                "--result_dir", root, "--mode", "fused"]
        t0 = time.perf_counter()
        sweep_cli.main(args)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sweep_cli.main(args)
        warm = time.perf_counter() - t0
        log(f"fused CLI sweep: cold {cold:.1f}s, warm {warm:.1f}s for 5 episodes")
        return {"s_per_episode_warm": round(warm / 5, 3),
                "episodes": 5, "path": "cli.sweep --mode fused"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # persistent compile cache: first-run compile of the eval program is ~2min
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    t_headline = time.perf_counter()
    jax_sps = bench_jax()
    headline_wall = time.perf_counter() - t_headline
    try:
        base_sps = bench_torch_cpu()
    except Exception as e:  # torch missing/broken must not kill the bench
        log(f"torch baseline failed: {e}")
        base_sps = float("nan")
    # The sweep stage compiles two more large programs; when the TPU tunnel
    # is misbehaving (a cold/draining tunnel has been measured taking 8 min
    # for a compile that normally takes 8 s), skip it rather than risk the
    # driver's budget — the headline JSON must always be printed.
    sweep = None
    if os.environ.get("MOC_BENCH_SWEEP", "1") != "0" and headline_wall < 120:
        try:
            sweep = bench_sweep_cli()
        except Exception as e:  # secondary metric must not kill the headline
            log(f"sweep bench failed: {e}")
    elif headline_wall >= 120:
        log(f"skipping sweep stage: headline took {headline_wall:.0f}s "
            "(tunnel misbehaving)")
    ratio = jax_sps / base_sps if base_sps == base_sps else None
    print(json.dumps({
        "metric": "moc_eval_slides_per_sec",
        "value": round(jax_sps, 2),
        "unit": "slides/sec/chip",
        "vs_baseline": round(ratio, 2) if ratio is not None else None,
        "sweep": sweep,
    }))


if __name__ == "__main__":
    main()
