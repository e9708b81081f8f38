"""Does XLA emit a fast native int8 MXU path on this chip? (gate probe)

Before building a W8A8 extraction-tower tier, measure the raw matmul at
ViT workload shapes: x [B*L, D] @ w [D, 4D] for CONCH-448 batch-64
(50240 x 768 @ 768 x 3072) — f32 vs bf16 vs int8xint8->int32 (per-token
activation scales + per-column weight scales applied to the result, the
same W8A8 formulation as ops/quant.int8_row_matmul).

v5e peak: bf16 ~394 TFLOP/s, int8 ~788 TOP/s. If the int8 timing is not
clearly below bf16, XLA is not hitting the native path and the tower tier
is dead on arrival — record and close.

Protocol: single TPU process, device-generated inputs, params as jit args,
device_time slope with median reduce, interleaved rounds, idle host.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_matmul_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from moc_tpu.utils import device_time  # noqa: E402

ROUNDS = 3
M, D, F = 50240, 768, 3072  # CONCH-448 batch-64 MLP c_fc shape


def main() -> None:
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.jit(lambda k: jax.random.normal(k, (M, D), jnp.float32))(kx)
    w = jax.jit(lambda k: jax.random.normal(k, (D, F), jnp.float32))(kw)

    @jax.jit
    def prep(x, w):
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        xs = jnp.max(jnp.abs(x), axis=1) / 127.0
        xq = jnp.clip(jnp.round(x / xs[:, None]), -127, 127).astype(jnp.int8)
        ws = jnp.max(jnp.abs(w), axis=0) / 127.0
        wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
        return xb, wb, xq, xs, wq, ws

    xb, wb, xq, xs, wq, ws = jax.block_until_ready(prep(x, w))

    @jax.jit
    def mm_f32(x, w):
        return x @ w

    @jax.jit
    def mm_bf16(xb, wb):
        return (xb @ wb).astype(jnp.bfloat16)

    @jax.jit
    def mm_i8(xq, xs, wq, ws):
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs[:, None] * ws[None, :]

    @jax.jit
    def mm_i8_dynamic(x, wq, ws):
        # dynamic activation quant IN-GRAPH (what the tower tier would run:
        # quant cost included)
        xs = jnp.max(jnp.abs(x), axis=1) / 127.0
        xq = jnp.clip(jnp.round(x / xs[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs[:, None] * ws[None, :]

    flops = 2 * M * D * F
    # warm all
    jax.block_until_ready(mm_f32(x, w))
    jax.block_until_ready(mm_bf16(xb, wb))
    jax.block_until_ready(mm_i8(xq, xs, wq, ws))
    jax.block_until_ready(mm_i8_dynamic(x, wq, ws))
    for r in range(ROUNDS):
        tf = device_time(mm_f32, x, w, iters=8, reduce="median")
        tb = device_time(mm_bf16, xb, wb, iters=8, reduce="median")
        ti = device_time(mm_i8, xq, xs, wq, ws, iters=8, reduce="median")
        td = device_time(mm_i8_dynamic, x, wq, ws, iters=8, reduce="median")
        print(f"round {r}: f32 {tf*1e3:7.2f} ms ({flops/tf/1e12:6.1f} TF/s)"
              f"  bf16 {tb*1e3:7.2f} ms ({flops/tb/1e12:6.1f} TF/s)"
              f"  i8 {ti*1e3:7.2f} ms ({flops/ti/1e12:6.1f} TOP/s)"
              f"  i8dyn {td*1e3:7.2f} ms ({flops/td/1e12:6.1f} TOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
