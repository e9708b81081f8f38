"""Interleaved A/B of the feature-storage serving tiers on the live device.

Times the masked exact MOC eval forward (batch 8, N=16384, D=512, topj=400,
topk=10 — the headline operating point) with the SAME bags resident as
f32 / bf16 / int8(+per-row scales). Interleaved rounds with best-of so the
tunnel's minute-to-minute bandwidth swings can't bias one arm
(BENCH_NOTES "Measurement note").

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/storage_tier_ab.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from moc_tpu.data.bags import Bag
from moc_tpu.data.batching import pack_bags
from moc_tpu.moc import MOCConfig, init_senet, make_episode_fns
from moc_tpu.utils.benchmark import device_time
from moc_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, N, D, C, CE = 8, 16384, 512, 2, 6
rng = np.random.default_rng(0)
bags = [Bag(slide_id=f"s{i}",
            features=rng.normal(size=(rng.integers(12000, N + 1), D)).astype(np.float32),
            coords=None, label=i % C) for i in range(B)]
w = jnp.asarray(rng.normal(size=(D, C)).astype(np.float32))
w_ext = jnp.asarray(rng.normal(size=(D, CE)).astype(np.float32))

cfg = MOCConfig(n_classes=C, n_ext_classes=CE, feature_dim=D)
_, params = init_senet(jax.random.PRNGKey(0), cfg)
_, eval_batch, _ = make_episode_fns(cfg)

arms = {}
for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                    ("int8", jnp.int8)):
    t0 = time.perf_counter()
    batch = pack_bags(bags, n_pad=N, dtype=dtype)
    batch = jax.block_until_ready(batch)
    arms[name] = batch
    print(f"{name}: packed+transferred in {time.perf_counter() - t0:.2f}s",
          flush=True)

# compile + correctness cross-check
outs = {}
for name, batch in arms.items():
    outs[name] = np.asarray(eval_batch(params, batch, w, w_ext))
    print(f"{name}: compiled; logits[0] = {outs[name][0]}", flush=True)
print("bf16 vs f32 max|d|:", np.abs(outs["bf16"] - outs["f32"]).max())
print("int8 vs f32 max|d|:", np.abs(outs["int8"] - outs["f32"]).max())

FLOOR = 0.10e-3  # a batch-8 N=16k forward cannot run in <0.1 ms; samples
# below it are the tunnel's under-measure mirage (verify SKILL.md gotcha)
samples = {name: [] for name in arms}
for round_i in range(10):
    for name, batch in arms.items():
        t = device_time(lambda b: eval_batch(params, b, w, w_ext), batch,
                        iters=10, warmup=1, repeats=3, reduce="median")
        if t >= FLOOR:
            samples[name].append(t)
    print(f"round {round_i}: " + "  ".join(
        f"{k}={samples[k][-1] * 1e3:.3f}ms" if samples[k] else f"{k}=?"
        for k in arms), flush=True)

med = {name: float(np.median(s)) for name, s in samples.items()}
f32 = med["f32"]
print("\n=== storage-tier A/B (masked exact path, batch 8, N=16384, "
      "median of rounds) ===")
for name, t in med.items():
    print(f"{name}: {t * 1e3:.3f} ms/batch-8  {B / t:.0f} slides/s  "
          f"{f32 / t:.2f}x vs f32  (n={len(samples[name])})")
