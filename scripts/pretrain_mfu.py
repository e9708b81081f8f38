"""Pretrain train-step throughput + MFU on one chip (VERDICT r3 weak #2).

Measures the masked-token pretrain step (``train/pretrain.py`` — the
torchscale-equivalent stack, ref ``architecture/encoder.py:116-162``) at
realistic operating points and converts step time to tokens/s and
%-of-peak via an explicit FLOPs model.

Operating points (BEiT3-base-ish: 768 wide, ffn 3072, 12 layers, 12 heads):
  * L=1024 dense attention, batch sized to fill the chip
  * L=8192 dilated attention (LongNet defaults truncated to ≤L)
  * MoE on (moe_freq=2, top-2, 8 experts) / off
  * remat on / off

FLOPs model (per token, per layer, fwd): 24·W² dense-proj MACs×2 = matmul
FLOPs (qkv 3W², out W², ffn 2·W·F with F=4W → 8W²+16W² = 24W²... computed
explicitly below from the config) + attention 4·L·W. Train step ≈ 3× fwd
(bwd ≈ 2× fwd). Peak reference: 197 TFLOP/s bf16 on v5e (f32 matmuls on
the MXU truncate operands to bf16 by default — DESIGN.md §13 — so the bf16
peak is the honest denominator for default-precision f32 programs too).

Run alone on the chip: ``python scripts/pretrain_mfu.py``
"""

from __future__ import annotations

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def step_flops(cfg, batch: int, seq: int) -> float:
    """Matmul FLOPs of one train step (fwd ×3 for fwd+bwd).

    Attention term: dense bills ``2·L·w`` score+AV MACs/token/layer. A
    dilated encoder computes LESS — branch (sl, r) runs flash over
    ``n_seg = L/sl`` segments of sparse length ``sl/r`` with all heads
    (``parallel/dilated.py:59-73`` keeps L/r rows per segment, H heads),
    i.e. ``n_seg·2·(sl/r)²·w = 2·L·(sl/r²)·w`` MACs per layer per item →
    ``Σ_branches 2·(sl/r²)·w`` per token. At the standard matrix point
    (L=8192, segments 2048/4096/8192, ratios 1/2/4) that is 0.4375× dense
    — billing dense here inflated the r4 dilated MFU rows ~1.5×
    (VERDICT r4 weak #1; corrected)."""
    e = cfg.encoder
    w, f, l, v = e.embed_dim, e.ffn_dim, e.layers, cfg.vocab_size
    proj = 4 * w * w          # qkv + out MACs/token/layer
    ffn = 2 * w * f
    moe_layers = l // e.moe_freq if e.moe_freq else 0
    # top-2 routing ≈ 2× ffn compute on MoE layers (capacity ≈ tokens)
    ffn_total = ffn * (l - moe_layers) + 2 * ffn * moe_layers
    if getattr(e, "dilated", None) is not None:
        attn = sum(2 * (min(sl, seq) / (r * r)) * w
                   for sl, r in zip(e.dilated.segment_lengths,
                                    e.dilated.dilated_ratios))
    else:
        attn = 2 * seq * w    # scores + weighted sum MACs/token/layer
    per_token = l * (proj + attn) + ffn_total + v * w  # + LM head
    return 3 * 2 * per_token * batch * seq  # ×2 FLOPs/MAC, ×3 train


def measure(name: str, cfg, batch: int, seq: int) -> dict:
    from jax.sharding import Mesh
    from moc_tpu.train.pretrain import (make_pretrain_state,
                                        make_sharded_train_step)
    from moc_tpu.utils import device_time

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1, 1),
                ("data", "seq", "tensor", "expert"))
    model, params, optimizer, opt_state, shardings = make_pretrain_state(
        cfg, mesh, seed=0)
    step = make_sharded_train_step(cfg, mesh, model, optimizer, shardings)

    ids = jax.jit(lambda k: jax.random.randint(
        k, (batch, seq), 0, cfg.vocab_size - 1, jnp.int32))(
        jax.random.PRNGKey(1))
    mask = jax.jit(lambda k: jax.random.uniform(k, (batch, seq)) < 0.15)(
        jax.random.PRNGKey(2))

    # donation: re-init state per timed call is wrong; instead time a
    # non-donating wrapper — copy args each call via device_put identity
    p, o = params, opt_state
    import time as _time

    t0 = _time.perf_counter()
    p, o, loss, aux = step(p, o, ids, mask)
    np.asarray(loss)
    compile_s = _time.perf_counter() - t0

    def run(ids_):
        nonlocal p, o
        p, o, loss, _ = step(p, o, ids_, mask)
        return loss

    t = device_time(run, ids, iters=5, repeats=3, reduce="median")
    fl = step_flops(cfg, batch, seq)
    row = {"point": name, "batch": batch, "seq": seq,
           "tokens_per_s": round(batch * seq / t, 0),
           "step_ms": round(t * 1e3, 2),
           "tflops_per_s": round(fl / t / 1e12, 1),
           "mfu_pct_bf16peak": round(100 * fl / t / PEAK_BF16, 1),
           "compile_plus_first_s": round(compile_s, 1),
           "loss": float(np.asarray(loss))}
    log(f"{name}: {row}")
    return row


def main():
    import re

    from moc_tpu.nn.encoder import EncoderConfig
    from moc_tpu.parallel.moe import MoEConfig
    from moc_tpu.parallel.dilated import DilatedConfig
    from moc_tpu.train.pretrain import PretrainConfig

    arm_filter = None
    if "--arms" in sys.argv:
        arm_filter = re.compile(sys.argv[sys.argv.index("--arms") + 1])

    dev = jax.devices()[0]
    log(f"backend: {dev.platform} ({dev.device_kind})")
    np.asarray(jnp.zeros((), jnp.float32) + 1.0)  # absorb first-dispatch toll

    base = dict(embed_dim=768, ffn_dim=3072, layers=12, heads=12)
    rows = []

    def pc(seq, param_dtype=None, **enc_kw):
        return PretrainConfig(
            vocab_size=8192, max_len=seq, param_dtype=param_dtype,
            encoder=EncoderConfig(**{**base, **enc_kw}))

    moe8 = lambda **kw: MoEConfig(n_experts=8, gate_type="top2", **kw)

    dil = DilatedConfig(segment_lengths=(2048, 4096, 8192),
                        dilated_ratios=(1, 2, 4))
    arms = [
        # L=1024 dense (f32 default, bf16 compute, bf16 compute+params)
        ("dense_L1024", pc(1024), 8, 1024),
        ("dense_L1024_bf16", pc(1024, compute_dtype="bfloat16"), 8, 1024),
        ("dense_L1024_bf16param",
         pc(1024, param_dtype="bfloat16", compute_dtype="bfloat16"), 8, 1024),
        ("dense_L1024_remat", pc(1024, remat=True), 8, 1024),
        # dense batch scaling: does bf16param close on 50% once the MXU is
        # fed bigger tiles? (b8 measured compute-bound at 42-43%)
        ("dense_L1024_bf16_b32",
         pc(1024, compute_dtype="bfloat16"), 32, 1024),
        ("dense_L1024_bf16param_b32",
         pc(1024, param_dtype="bfloat16", compute_dtype="bfloat16"),
         32, 1024),
        # MoE (top-2, 8 experts every 2nd layer): dispatch_impl A/B (VERDICT
        # r4 weak #2) + batch scaling (einsum dispatch cost grows ~S², the
        # gather path linearly; b32 OOMs the 16G v5e for BOTH impls at this
        # width — b16 already separates the scaling laws)
        ("moe_L1024", pc(1024, moe_freq=2, moe=moe8()), 8, 1024),
        ("moe_L1024_bf16",
         pc(1024, moe_freq=2, compute_dtype="bfloat16", moe=moe8()), 8, 1024),
        ("moe_L1024_gather",
         pc(1024, moe_freq=2, moe=moe8(dispatch_impl="gather")), 8, 1024),
        ("moe_L1024_gather_bf16",
         pc(1024, moe_freq=2, compute_dtype="bfloat16",
            moe=moe8(dispatch_impl="gather")), 8, 1024),
        ("moe_L1024_einsumbf16",
         pc(1024, moe_freq=2, compute_dtype="bfloat16",
            moe=moe8(dispatch_impl="einsum_bf16")), 8, 1024),
        ("moe_L1024_bf16_b16",
         pc(1024, moe_freq=2, compute_dtype="bfloat16", moe=moe8()),
         16, 1024),
        ("moe_L1024_gather_bf16_b16",
         pc(1024, moe_freq=2, compute_dtype="bfloat16",
            moe=moe8(dispatch_impl="gather")), 16, 1024),
        # L=8192 dilated (LongNet segments ≤ L)
        ("dilated_L8192", pc(8192, dilated=dil), 1, 8192),
        ("dilated_L8192_bf16",
         pc(8192, dilated=dil, compute_dtype="bfloat16"), 1, 8192),
        ("dilated_L8192_bf16param",
         pc(8192, param_dtype="bfloat16", dilated=dil,
            compute_dtype="bfloat16"), 1, 8192),
        ("dilated_L8192_remat", pc(8192, dilated=dil, remat=True), 1, 8192),
    ]
    for name, cfg, b, seq in arms:
        if arm_filter is not None and not arm_filter.search(name):
            continue
        try:
            rows.append(measure(name, cfg, batch=b, seq=seq))
        except Exception as e:  # OOM etc. — record, keep the matrix going
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            rows.append({"point": name, "batch": b, "seq": seq,
                         "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    print(json.dumps({"platform": f"{dev.platform}:{dev.device_kind}",
                      "peak_ref": "197 TFLOP/s bf16 (v5e)",
                      "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
