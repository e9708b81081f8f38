"""Flash attention kernel vs plain-XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_with_lse,
    mha_reference,
)


def _inputs(seed, b=1, h=2, lq=256, lkv=256, d=128):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lkv, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference(causal):
    q, k, v = _inputs(0)
    out, lse = flash_attention_with_lse(q, k, v, causal=causal)
    ref, ref_lse = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=2e-5, atol=2e-5)


def test_forward_multiblock():
    q, k, v = _inputs(1, lq=384, lkv=512)
    out, lse = flash_attention_with_lse(q, k, v, block_q=128, block_k=128)
    ref, ref_lse = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=2e-5, atol=2e-5)


def test_segment_mask_padding():
    """Padding via segment ids: pad rows/cols (segment 0) never attend real
    tokens (segment 1) and vice versa."""
    q, k, v = _inputs(2, lq=256, lkv=256)
    n_real = 130
    seg = (jnp.arange(256) < n_real).astype(jnp.int32)[None]  # [1, 256]
    out, lse = flash_attention_with_lse(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    ref, ref_lse = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # real-row outputs must equal attention restricted to real keys
    ref_small, _ = mha_reference(q[:, :, :n_real], k[:, :, :n_real], v[:, :, :n_real],
                                 sm_scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out[:, :, :n_real]), np.asarray(ref_small),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_matches_reference(causal):
    q, k, v = _inputs(3, lq=256, lkv=256, d=128)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal)[0] ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_backward_with_segments():
    q, k, v = _inputs(4, lq=128, lkv=256, d=128)
    seg_q = (jnp.arange(128) < 100).astype(jnp.int32)[None]
    seg_kv = (jnp.arange(256) < 200).astype(jnp.int32)[None]

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, q_segment_ids=seg_q, kv_segment_ids=seg_kv) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            mha_reference(q, k, v, q_segment_ids=seg_q, kv_segment_ids=seg_kv)[0] ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_bf16_forward():
    q, k, v = _inputs(5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb)
    ref, _ = mha_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_non_divisible_lengths():
    """Odd sequence lengths (dilated-branch shapes) pick a fitting block."""
    q, k, v = _inputs(6, lq=384, lkv=640, d=128)
    out, lse = flash_attention_with_lse(q, k, v, block_q=512, block_k=512)
    ref, ref_lse = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    q2, k2, v2 = _inputs(7, lq=96, lkv=96, d=128)  # smaller than every block
    out2, _ = flash_attention_with_lse(q2, k2, v2)
    ref2, _ = mha_reference(q2, k2, v2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-5, atol=2e-5)
