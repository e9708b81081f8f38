"""Flash-kernel A/B at its TARGET shapes: LongNet segment lengths 2k-32k.

VERDICT r3 weak #1: the Pallas flash kernel lost every A/B it ran (towers,
TransMIL, descent) yet ships as the default inside the dilated path
(``parallel/dilated.py:41`` ``use_flash=True``) at seq 2k-32k where it was
never measured. This script produces the crossover table that decides the
default:

  * raw kernel: ``flash_attention_with_lse`` vs XLA dense (``mha_reference``)
    at L ∈ {2048, 4096, 8192, 16384, 32768}, head_dim ∈ {64, 128}, bf16+f32
    — B·H sized like the BEiT3/LongNet stacks (width 1024: H=16@d64, H=8@d128);
    dense arms only where the [B, H, L, L] score tensor fits HBM (16 GB v5e:
    f32 scores at L=16384/H=16 are 16 GB → dense is structurally OOM there,
    which is itself a finding);
  * block-size sweep at head_dim 64 (the known lane-waste case);
  * fwd+bwd arm (training is the consumer) at two shapes;
  * end-to-end ``dilated_attention`` use_flash True/False at L=8192/32768.

Run alone on the chip (single-TPU-process rule):
``python scripts/flash_longseq_ab.py | tee /tmp/flash_ab.json``
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def attn_flops(b, h, l, d, causal=False):
    f = 4.0 * b * h * l * l * d  # QK^T + PV, 2 FLOPs/MAC
    return f / 2 if causal else f


def main():
    from moc_tpu.ops.flash_attention import (flash_attention_with_lse,
                                             mha_reference)
    from moc_tpu.utils import device_time

    dev = jax.devices()[0]
    log(f"backend: {dev.platform} ({dev.device_kind})")
    # tiny-op first: absorb the per-process first-dispatch tunnel toll
    np.asarray(jnp.zeros((), jnp.float32) + 1.0)

    results = {"platform": f"{dev.platform}:{dev.device_kind}", "rows": []}
    B = 1

    def qkv(l, d, h, dtype, key):
        ks = jax.random.split(key, 3)
        mk = jax.jit(lambda k: jax.random.normal(k, (B, h, l, d), dtype),
                     static_argnums=())
        return tuple(mk(k) for k in ks)

    def time_arm(name, fn, *args):
        try:
            t = device_time(lambda a: fn(a, *args[1:]), args[0],
                            iters=5, repeats=3, reduce="median")
            return t
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None

    shapes = [(l, 64, 16) for l in (2048, 4096, 8192, 16384, 32768)]
    shapes += [(l, 128, 8) for l in (2048, 8192, 32768)]
    key = jax.random.PRNGKey(0)

    for (l, d, h) in shapes:
        for dtype_name in ("bfloat16", "float32"):
            dtype = jnp.dtype(dtype_name)
            if dtype_name == "float32" and l not in (8192, 32768):
                continue  # f32 secondary: two lengths only
            key, sub = jax.random.split(key)
            q, k, v = qkv(l, d, h, dtype, sub)
            row = {"L": l, "d": d, "h": h, "dtype": dtype_name}

            flash = jax.jit(lambda a, b_, c: flash_attention_with_lse(
                a, b_, c)[0])
            t = time_arm("flash", flash, q, k, v)
            if t:
                row["flash_ms"] = round(t * 1e3, 3)
                row["flash_tflops"] = round(attn_flops(B, h, l, d) / t / 1e12, 1)

            # dense only where scores fit: bytes = B*h*l*l*4 (f32 softmax)
            score_gb = B * h * l * l * 4 / 2**30
            if score_gb <= 6.0:
                dense = jax.jit(lambda a, b_, c: mha_reference(a, b_, c)[0])
                t = time_arm("dense", dense, q, k, v)
                if t:
                    row["dense_ms"] = round(t * 1e3, 3)
                    row["dense_tflops"] = round(
                        attn_flops(B, h, l, d) / t / 1e12, 1)
            else:
                row["dense_ms"] = f"OOM-by-construction ({score_gb:.0f} GB scores)"
            results["rows"].append(row)
            log(f"L={l} d={d} h={h} {dtype_name}: {row}")

    # block sweep at head_dim 64, L=8192/32768, bf16
    for l in (8192, 32768):
        key, sub = jax.random.split(key)
        q, k, v = qkv(l, 64, 16, jnp.bfloat16, sub)
        for (bq, bk) in ((512, 512), (512, 1024), (1024, 1024),
                         (2048, 1024), (1024, 2048), (2048, 2048)):
            fn = jax.jit(lambda a, b_, c, bq=bq, bk=bk:
                         flash_attention_with_lse(a, b_, c, block_q=bq,
                                                  block_k=bk)[0])
            t = time_arm(f"blocks{bq}x{bk}", fn, q, k, v)
            if t:
                results["rows"].append(
                    {"L": l, "d": 64, "h": 16, "dtype": "bfloat16",
                     "blocks": [bq, bk], "flash_ms": round(t * 1e3, 3),
                     "flash_tflops": round(
                         attn_flops(B, 16, l, 64) / t / 1e12, 1)})
                log(f"L={l} blocks {bq}x{bk}: {t*1e3:.3f} ms")

    # fwd+bwd (training consumer). Note: flash_attention_with_lse's bwd is
    # the dense vjp by design (lse cotangent), so the pure-Pallas-bwd arm is
    # `flash_attention` (out-only).
    from moc_tpu.ops.flash_attention import flash_attention

    for (l, d, h) in ((8192, 64, 16), (8192, 128, 8)):
        key, sub = jax.random.split(key)
        q, k, v = qkv(l, d, h, jnp.bfloat16, sub)

        def loss_lse(a, b_, c):
            return jnp.sum(flash_attention_with_lse(a, b_, c)[0].astype(jnp.float32))

        def loss_flash(a, b_, c):
            return jnp.sum(flash_attention(a, b_, c).astype(jnp.float32))

        def loss_dense(a, b_, c):
            return jnp.sum(mha_reference(a, b_, c)[0].astype(jnp.float32))

        row = {"L": l, "d": d, "h": h, "dtype": "bfloat16", "mode": "fwd+bwd"}
        for name, lf in (("flash_lse_densebwd", loss_lse),
                         ("flash_pallas_bwd", loss_flash),
                         ("dense", loss_dense)):
            g = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))
            t = time_arm(name, g, q, k, v)
            if t:
                row[f"{name}_ms"] = round(t * 1e3, 3)
        results["rows"].append(row)
        log(f"fwd+bwd {row}")

    # end-to-end dilated attention, flash vs dense branches
    # (dilated_attention consumes [B, L, H, D] layout)
    from moc_tpu.parallel.dilated import DilatedConfig, dilated_attention

    for l in (8192, 32768):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, 3)
        mk = jax.jit(lambda kk: jax.random.normal(kk, (B, l, 16, 64),
                                                  jnp.bfloat16))
        q, k, v = (mk(kk) for kk in ks)
        seg = tuple(s for s in (2048, 4096, 8192, 16384, 32768) if s <= l)
        rat = (1, 2, 4, 6, 12)[: len(seg)]
        for use_flash in (True, False):
            cfg = DilatedConfig(segment_lengths=seg, dilated_ratios=rat,
                                use_flash=use_flash)
            fn = jax.jit(lambda a, b_, c, cfg=cfg: dilated_attention(
                a, b_, c, cfg)[0])
            t = time_arm(f"dilated flash={use_flash}", fn, q, k, v)
            if t is not None:
                results["rows"].append(
                    {"L": l, "d": 64, "h": 16, "dtype": "bfloat16",
                     "mode": f"dilated_use_flash={use_flash}",
                     "ms": round(t * 1e3, 3)})
                log(f"dilated L={l} flash={use_flash}: {t*1e3:.3f} ms")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
