"""Vision-tower attention A/B: XLA dense vs Pallas flash (lane-padded).

The extraction towers are the production pipeline's FLOPs bulk, and dense
attention materializes the [B, H, L, L] score tensor per layer (CONCH-448:
785 tokens -> ~1.9 GB f32 per layer at batch 64). This measures, at release
shapes with random-init weights (identical FLOPs/layout to real ones):

  * CONCH ViT-B/16 448px `VisionTransformer` — attn_impl dense vs flash
  * MUSK-large 384px encoder — the default path (XLA dense fallback at
    577 unaligned tokens) vs a forced lane-padded Pallas kernel

MEASURED 2026-08-20 (v5 lite, interleaved rounds, median): dense WINS
everywhere — conch flash 0.77x f32 / 0.81x bf16, musk 0.82x / 0.95x;
cosine vs dense ≥ 0.9999. Hence dense stays the default and attn_impl=
"flash" is documented as a memory-headroom knob (BENCH_NOTES r3 s7).

Protocol (verify-skill gotchas): single TPU process, params built ON
device via jitted init, inputs generated on device, params passed as jit
ARGUMENTS, `device_time` slope timing with median reduce, interleaved
A/B rounds. Run only on an otherwise-idle host (no concurrent CPU suite).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tower_flash_ab.py
"""

from __future__ import annotations


import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from moc_tpu.utils import device_time  # noqa: E402

ROUNDS = 3


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def conch_ab(batch: int = 64, bf16: bool = False) -> None:
    from moc_tpu.nn.vit import VisionTransformer

    kw = dict(image_size=448, patch_size=16, dim=768, num_layers=12,
              num_heads=12)
    dense = VisionTransformer(**kw)
    flash = VisionTransformer(**kw, attn_impl="flash")
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    images = jax.jit(
        lambda k: jax.random.normal(k, (batch, 448, 448, 3), dtype),
        )(jax.random.PRNGKey(1))
    params = jax.jit(dense.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 448, 448, 3), jnp.float32))
    params = _cast(params, dtype) if bf16 else params

    d_fn = jax.jit(dense.apply)
    f_fn = jax.jit(flash.apply)
    # numerics check first (also warms both compiles)
    od = np.asarray(d_fn(params, images), np.float32)
    of = np.asarray(f_fn(params, images), np.float32)
    cos = np.sum(od * of, -1) / np.clip(
        np.linalg.norm(od, axis=-1) * np.linalg.norm(of, axis=-1), 1e-9, None)
    print(f"conch {'bf16' if bf16 else 'f32 '} token cosine min "
          f"{cos.min():.6f} mean {cos.mean():.6f}", flush=True)

    for r in range(ROUNDS):
        td = device_time(d_fn, params, images, iters=4, reduce="median")
        tf = device_time(f_fn, params, images, iters=4, reduce="median")
        print(f"  round {r}: dense {td * 1e3:8.1f} ms  flash {tf * 1e3:8.1f} "
              f"ms  ({td / tf:.2f}x)", flush=True)


def musk_ab(batch: int = 32, bf16: bool = False) -> None:
    """Default encoder path (flash_attention → XLA dense fallback at 577
    unaligned tokens) vs a forced lane-padded Pallas kernel."""
    import moc_tpu.nn.encoder as enc_mod
    from moc_tpu.models.musk import MUSK, MuskConfig
    from moc_tpu.ops.flash_attention import flash_attention_padded

    model = MUSK(MuskConfig())
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    images = jax.jit(
        lambda k: jax.random.normal(k, (batch, 384, 384, 3), dtype),
        )(jax.random.PRNGKey(3))
    params = jax.jit(lambda k, im: model.init(k, images=im))(
        jax.random.PRNGKey(2), jnp.zeros((1, 384, 384, 3), jnp.float32))
    params = _cast(params, dtype) if bf16 else params

    def forced_kernel(q, k, v, *, q_segment_ids=None, kv_segment_ids=None,
                      **kw):
        pad_mask = None
        if q_segment_ids is not None:
            pad_mask = q_segment_ids == 0
        return flash_attention_padded(q, k, v, padding_mask=pad_mask)

    real = enc_mod.flash_attention

    def encode(p, im):
        emb, _, _ = model.apply(p, images=im)
        return emb

    dense_fn = jax.jit(encode)
    enc_mod.flash_attention = forced_kernel
    flash_fn = jax.jit(lambda p, im: encode(p, im))
    try:
        of = np.asarray(flash_fn(params, images), np.float32)
    finally:
        enc_mod.flash_attention = real
    od = np.asarray(dense_fn(params, images), np.float32)
    cos = np.sum(od * of, -1) / np.clip(
        np.linalg.norm(od, axis=-1) * np.linalg.norm(of, axis=-1), 1e-9, None)
    print(f"musk  {'bf16' if bf16 else 'f32 '} embed cosine min "
          f"{cos.min():.6f} mean {cos.mean():.6f}", flush=True)

    for r in range(ROUNDS):
        td = device_time(dense_fn, params, images, iters=4, reduce="median")
        tf = device_time(flash_fn, params, images, iters=4, reduce="median")
        print(f"  round {r}: dense {td * 1e3:8.1f} ms  flash {tf * 1e3:8.1f} "
              f"ms  ({td / tf:.2f}x)", flush=True)


def main() -> None:
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "conch"):
        conch_ab(bf16=False)
        conch_ab(bf16=True)
    if which in ("all", "musk"):
        musk_ab(bf16=False)
        musk_ab(bf16=True)


if __name__ == "__main__":
    main()
