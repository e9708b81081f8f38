"""Streaming attention pooling: exact equivalence (forward AND gradients) to
the monolithic softmax-weighted mean, padding invariance, and chunk-size
independence."""

import jax
import jax.numpy as jnp
import numpy as np

from moc_tpu.train.accum import chunk_bag, streaming_attention_pool


def _setup(n=57, d=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    w_embed = jnp.asarray(rng.normal(size=(6, d)).astype(np.float32))
    w_score = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 49)
    return feats, w_embed, w_score, valid


def _dense_pool(feats, w_embed, w_score, valid):
    h = jnp.tanh(feats @ w_embed)
    a = jnp.where(valid, h @ w_score, -1e30)
    w = jax.nn.softmax(a)
    return w @ h


def _stream_pool(feats, w_embed, w_score, valid, chunk):
    chunks, cv = chunk_bag(feats, valid, chunk)
    pooled, _ = streaming_attention_pool(
        lambda x: jnp.tanh(x @ w_embed), lambda h: h @ w_score, chunks, cv)
    return pooled


def test_forward_matches_dense():
    feats, w_embed, w_score, valid = _setup()
    dense = _dense_pool(feats, w_embed, w_score, valid)
    for chunk in (8, 16, 57, 64):
        got = _stream_pool(feats, w_embed, w_score, valid, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=1e-5, atol=1e-6)


def test_gradients_match_dense():
    feats, w_embed, w_score, valid = _setup()
    tgt = jnp.ones(w_embed.shape[1])

    def loss_dense(we, ws):
        return jnp.sum((_dense_pool(feats, we, ws, valid) - tgt) ** 2)

    def loss_stream(we, ws):
        return jnp.sum((_stream_pool(feats, we, ws, valid, 16) - tgt) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1))(w_embed, w_score)
    gs = jax.jit(jax.grad(loss_stream, argnums=(0, 1)))(w_embed, w_score)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_padding_rows_are_inert():
    feats, w_embed, w_score, valid = _setup()
    poisoned = feats.at[50:].set(jnp.nan)  # pad rows (valid < 49... beyond 49)
    a = _stream_pool(feats, w_embed, w_score, valid, 16)
    b = _stream_pool(poisoned, w_embed, w_score, valid, 16)
    assert bool(jnp.isfinite(b).all())
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_all_pad_bag_pools_to_zero():
    feats, w_embed, w_score, _ = _setup()
    none = jnp.zeros(feats.shape[0], bool)
    pooled = _stream_pool(feats, w_embed, w_score, none, 16)
    np.testing.assert_allclose(np.asarray(pooled), 0.0, atol=1e-6)
