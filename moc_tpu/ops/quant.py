"""int8 feature quantization for the serving tiers.

The reference serves nothing (scoring re-runs the training script,
``/root/reference/main_moc.py:462-520``) and keeps features f32 end-to-end.
On TPU the eval wall is the HBM read of the ``[N, D]`` features and — on
tunnel/DCN-attached hosts — the host->device transfer of the same bytes
(BENCH_NOTES "bf16-RESIDENT features"). This module adds the tier below
bfloat16: **W8A8 dynamic quantization** with per-row activation scales and
per-column weight scales, so the scoring matmul reads 1 byte/element and
runs on the MXU's native int8 path (2x the bf16 peak on v5e):

    feats ~= q * s_row[:, None]          (symmetric absmax/127 per patch)
    w     ~= wq * s_col[None, :]         (symmetric absmax/127 per class col)
    feats @ w ~= (q @ wq) * s_row[:, None] * s_col[None, :]

The int32 accumulation is exact, so the ONLY error is the two rounding
steps — the same approximation class as ``--score_dtype bfloat16`` but with
explicit scales (int8 with a per-row scale has ~the dynamic range the
features actually use, where raw bf16 spends exponent bits on range the
data never touches).

Host-side quantization (``quantize_rows_host``) runs at pack time; device
matmuls (``int8_row_matmul``) live inside the jitted forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows_host(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization of ``[..., N, D]`` features.

    Returns ``(q int8, scales f32[..., N])`` with ``q * scales[..., None]``
    approximating ``features``. All-zero rows (bag padding) get scale 0 so
    their dequantized value stays exactly 0.
    """
    f = np.ascontiguousarray(np.asarray(features, np.float32))
    if f.ndim >= 2:
        # native single-pass kernel (bit-identical; the numpy formulation
        # below streams the tensor ~4x through temporaries — on the serving
        # path the quant step is ~25% of per-request latency)
        from moc_tpu.data.native import quantize_rows_i8

        native = quantize_rows_i8(f)
        if native is not None:
            return native
    absmax = np.max(np.abs(f), axis=-1)
    scales = absmax.astype(np.float32) / np.float32(127.0)
    # all-f32 arithmetic so this fallback rounds bit-identically to the
    # native kernel (an f64 inverse would shift half-to-even ties)
    inv = np.float32(1.0) / np.where(scales > 0, scales, np.float32(1.0))
    inv = np.where(scales > 0, inv.astype(np.float32), np.float32(0.0))
    q = np.clip(np.rint(f * inv[..., None]), -127, 127).astype(np.int8)
    return q, scales


def quantize_rows_device(features: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side mirror of :func:`quantize_rows_host` (same absmax/127
    scheme, f32 arithmetic, all-zero rows → scale 0) for quantizing
    already-resident f32 features without a host round-trip — e.g. when the
    f32 bags were produced on device, or on tunnel-attached hosts where the
    host→device re-transfer of quantized bytes would dominate. Jit-safe.

    Matches the host kernel exactly on CPU backends; on TPU the division
    may differ by 1 ulp on exact scale ties (same approximation class —
    the int32 matmul downstream is exact either way).
    """
    f = features.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(f), axis=-1)
    scales = absmax / jnp.float32(127.0)
    inv = jnp.where(scales > 0, jnp.float32(1.0) / jnp.where(
        scales > 0, scales, jnp.float32(1.0)), jnp.float32(0.0))
    q = jnp.clip(jnp.rint(f * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scales


def quantize_columns(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-column symmetric int8 quantization of a ``[D, C]`` weight matrix
    (device-side; the matrices are tiny so this folds into the program)."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / scales[None, :]), -127, 127).astype(jnp.int8)
    return wq, scales.astype(jnp.float32)


def int8_row_matmul(q: jax.Array, row_scales: jax.Array, w: jax.Array) -> jax.Array:
    """``dequant(q) @ w`` without ever materializing the dequantized rows.

    ``q [N, D] int8`` with ``row_scales [N]``; ``w [D, C]`` float (quantized
    per-column on the fly). The dot runs int8 x int8 -> int32 on the MXU;
    scales are applied to the ``[N, C]`` result, which is ~D/ C times smaller
    than the operand the f32 path would have streamed.
    """
    wq, col_scales = quantize_columns(w)
    acc = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * row_scales[:, None] * col_scales[None, :]


def dequantize_rows(q: jax.Array, row_scales: jax.Array) -> jax.Array:
    """Materialize f32 rows from the int8 tier (fallback for consumers with
    no scaled-matmul formulation, e.g. the non-fused senet apply)."""
    return q.astype(jnp.float32) * row_scales[..., None]
