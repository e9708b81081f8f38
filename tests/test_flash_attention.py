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


# ──────────────────── lane-padding wrapper (towers) ────────────────────


def test_padded_wrapper_unaligned_matches_dense():
    """flash_attention_padded at a non-128-multiple length (the vision-tower
    shapes: 785/577 tokens) runs the REAL kernel on lane-padded inputs and
    matches dense attention on the original length."""
    from moc_tpu.ops.flash_attention import flash_attention_padded

    q, k, v = _inputs(8, b=2, h=2, lq=99, lkv=99, d=128)
    out = flash_attention_padded(q, k, v)
    ref, _ = mha_reference(q, k, v)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_padded_wrapper_padding_mask():
    """padding_mask (True = masked key) joins the pad segment: real rows
    equal attention restricted to real keys; grads flow (pretrain path)."""
    from moc_tpu.ops.flash_attention import flash_attention_padded

    q, k, v = _inputs(9, b=2, h=2, lq=70, lkv=70, d=128)
    n_real = 53
    mask = (jnp.arange(70) >= n_real)[None].repeat(2, axis=0)  # [B, L]
    out = flash_attention_padded(q, k, v, padding_mask=mask)
    ref, _ = mha_reference(q[:, :, :n_real], k[:, :, :n_real], v[:, :, :n_real])
    np.testing.assert_allclose(np.asarray(out[:, :, :n_real]), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss(q, k, v):
        o = flash_attention_padded(q, k, v, padding_mask=mask)
        return jnp.sum(o[:, :, :n_real] ** 2)

    def loss_ref(q, k, v):
        o, _ = mha_reference(q[:, :, :n_real], k[:, :, :n_real], v[:, :, :n_real])
        return jnp.sum(o ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf[:, :, :n_real]),
                                   np.asarray(gr[:, :, :n_real]),
                                   rtol=5e-4, atol=5e-4, err_msg=f"d{name}")
        # masked rows get zero grad (they influence nothing real)
        np.testing.assert_allclose(np.asarray(gf[:, :, n_real:]), 0.0,
                                   atol=5e-4, err_msg=f"d{name} pad rows")


def test_padded_wrapper_rejects_cross_attention_shapes():
    from moc_tpu.ops.flash_attention import flash_attention_padded

    q, k, v = _inputs(10, lq=64, lkv=128, d=128)
    with pytest.raises(ValueError):
        flash_attention_padded(q, k, v)


def test_vit_flash_matches_dense():
    """The ViT trunk's attn_impl="flash" tier is numerically the dense trunk
    (same params, unaligned token count exercises the padding)."""
    from moc_tpu.nn.vit import VisionTransformer

    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(2, 48, 48, 3)).astype(np.float32))
    dense = VisionTransformer(image_size=48, patch_size=16, dim=128,
                              num_layers=2, num_heads=2)
    flash = VisionTransformer(image_size=48, patch_size=16, dim=128,
                              num_layers=2, num_heads=2, attn_impl="flash")
    params = dense.init(jax.random.PRNGKey(0), images)
    out_dense = dense.apply(params, images)
    out_flash = flash.apply(params, images)  # 10 tokens → padded to 128
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_lse_grad_false_backward_matches_reference(causal):
    """``lse_grad=False`` routes the backward through the Pallas dq/dkv
    kernels; for a loss that consumes only ``out`` (plus lse as
    stop-gradient statistics — the dilated-recombination pattern), its
    gradients must equal the dense reference's."""
    from moc_tpu.ops.flash_attention import flash_attention_with_lse

    q, k, v = _inputs(9, lq=256, lkv=256, d=128)

    def loss_sg(q, k, v):
        out, lse = flash_attention_with_lse(q, k, v, causal=causal,
                                            lse_grad=False)
        # lse enters only through a stop-gradient-weighted scale, mirroring
        # dilated_attention's softmax(lse) branch weights
        w = jax.lax.stop_gradient(jax.nn.softmax(lse, axis=-1))
        return jnp.sum((out * w[..., None]) ** 2)

    def loss_ref(q, k, v):
        out, lse = mha_reference(q, k, v, causal=causal)
        w = jax.lax.stop_gradient(jax.nn.softmax(lse, axis=-1))
        return jnp.sum((out * w[..., None]) ** 2)

    g_sg = jax.grad(loss_sg, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_sg, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=f"d{name}")


def test_lse_grad_false_values_identical_to_default():
    """Forward values (out AND lse) are identical across the two modes —
    only the vjp route differs."""
    from moc_tpu.ops.flash_attention import flash_attention_with_lse

    q, k, v = _inputs(10, lq=256, lkv=256, d=128)
    o1, l1 = flash_attention_with_lse(q, k, v)
    o2, l2 = flash_attention_with_lse(q, k, v, lse_grad=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
