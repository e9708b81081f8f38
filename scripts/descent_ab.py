"""A/B the multi-bit descent on TPU: raw mask op + full eval_batch headline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/descent_ab.py
(one TPU process at a time; see .claude/skills/verify/SKILL.md gotchas)
"""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp

t0 = time.time()
dev = jax.devices()[0]
print(f"backend: {dev.platform} ({dev.device_kind}) init {time.time()-t0:.1f}s",
      flush=True)

from moc_tpu.utils import device_time
from moc_tpu.ops.masking import threshold_topk_mask
from moc_tpu.moc import MOCConfig, make_episode_fns, init_senet
from moc_tpu.data.batching import BagBatch
import moc_tpu.ops.masking as masking

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.normal(size=(40, 16384)).astype(np.float32))
K = 400

base = None
print("--- raw threshold_topk_mask [40,16384] k=400 ---", flush=True)
for g in (1, 2, 4, 8):
    fn = jax.jit(lambda x, g=g: threshold_topk_mask(x, K, axis=-1, bits_per_step=g))
    out = np.asarray(fn(keys))
    if base is None:
        base = out
    else:
        assert (out == base).all(), f"g={g} mismatch!"
    t = device_time(fn, keys, iters=20, repeats=6, reduce="median")
    print(f"g={g}: {t*1e3:.3f} ms", flush=True)

print("--- end-to-end eval_batch (headline op point) per g ---", flush=True)
cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=400, topk=10, feature_dim=512)
feats = rng.normal(size=(8, 16384, 512)).astype(np.float32)
batch = BagBatch(features=jnp.asarray(feats),
                 mask=jnp.ones((8, 16384), bool),
                 labels=jnp.zeros((8,), jnp.int32),
                 n_patches=jnp.full((8,), 16384, jnp.int32))
w = jnp.asarray(rng.normal(size=(512, 2)).astype(np.float32))
w_ext = jnp.asarray(rng.normal(size=(512, 6)).astype(np.float32))
_, params = init_senet(jax.random.PRNGKey(0), cfg)

ref_out = None
for g in ("1", "2", "4", "8"):
    os.environ["MOC_TPU_DESCENT_BITS"] = g
    _, eval_batch, _ = make_episode_fns(cfg)

    def fresh(b, _f=eval_batch):
        return _f(params, b, w, w_ext)

    jfn = jax.jit(fresh)
    out = np.asarray(jfn(batch))
    if ref_out is None:
        ref_out = out
    else:
        assert (out == ref_out).all(), f"headline mismatch at g={g}"
    t = device_time(jfn, batch, iters=20, repeats=6, reduce="median")
    print(f"g={g}: {t*1e3:.3f} ms/batch-8 -> {8/t:.0f} slides/s", flush=True)
os.environ.pop("MOC_TPU_DESCENT_BITS")
print("done", flush=True)

# --- bf16 scoring tier at the winner g (serving tier, BENCH_NOTES row) ---
best_g = os.environ.get("AB_BEST_G", "1")
os.environ["MOC_TPU_DESCENT_BITS"] = best_g
cfg16 = MOCConfig(n_classes=2, n_ext_classes=6, topj=400, topk=10,
                  feature_dim=512, score_dtype="bfloat16")
_, eval16, _ = make_episode_fns(cfg16)
jfn16 = jax.jit(lambda b: eval16(params, b, w, w_ext))
np.asarray(jfn16(batch))
t16 = device_time(jfn16, batch, iters=20, repeats=6, reduce="median")
print(f"bf16 tier (g={best_g}): {t16*1e3:.3f} ms/batch-8 -> {8/t16:.0f} slides/s",
      flush=True)
os.environ.pop("MOC_TPU_DESCENT_BITS", None)
