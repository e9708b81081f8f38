"""Tests for the cached decoder and the ResNet/ViT factories."""

import jax
import jax.numpy as jnp
import numpy as np

from moc_tpu.nn.decoder import Decoder, DecoderConfig, greedy_generate
from moc_tpu.nn.resnet import ResNet50Trunk, vit_large, vit_small

CFG = DecoderConfig(embed_dim=32, ffn_dim=64, layers=2, heads=4)


def test_decoder_full_vs_incremental():
    """Cached single-step decoding reproduces the full causal forward."""
    rng = np.random.default_rng(0)
    b, l = 2, 6
    x = jnp.asarray(rng.normal(size=(b, l, 32)).astype(np.float32))
    dec = Decoder(CFG)
    params = dec.init(jax.random.PRNGKey(0), x)
    full, _ = dec.apply(params, x)

    caches = dec.init_cache(b, l)
    outs = []
    for i in range(l):
        h, caches = dec.apply(params, x[:, i : i + 1], None, None, caches, i)
        outs.append(h)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full), rtol=2e-4, atol=2e-5)


def test_decoder_cross_attention():
    rng = np.random.default_rng(1)
    cfg = DecoderConfig(embed_dim=32, ffn_dim=64, layers=2, heads=4,
                        cross_attention=True)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(2, 7, 32)).astype(np.float32))
    mem_mask = jnp.asarray(np.array([[True] * 7, [True] * 4 + [False] * 3]))
    dec = Decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0), x, mem, mem_mask)
    out, _ = dec.apply(params, x, mem, mem_mask)
    assert out.shape == x.shape
    # masked memory positions don't affect the output
    mem2 = mem.at[1, 4:].set(99.0)
    out2, _ = dec.apply(params, x, mem2, mem_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_greedy_generate():
    vocab, d, b, l = 17, 32, 2, 8
    dec = Decoder(CFG)
    rng = jax.random.PRNGKey(2)
    params = dec.init(rng, jnp.zeros((b, 1, d)))
    emb = jax.random.normal(jax.random.PRNGKey(3), (vocab, d)) * 0.1
    head = jax.random.normal(jax.random.PRNGKey(4), (d, vocab)) * 0.1
    pos = jax.random.normal(jax.random.PRNGKey(5), (l, d)) * 0.1

    def embed_fn(tokens, idx):
        return (emb[tokens] + pos[idx])[:, None, :]

    def logits_fn(h):
        return h[:, 0] @ head

    out = greedy_generate(dec, params, embed_fn, logits_fn, batch=b, seq_len=l,
                          bos_id=1, eos_id=2)
    assert out.shape == (b, l)
    assert out.dtype == jnp.int32
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < vocab))


def test_resnet50_trunk():
    model = ResNet50Trunk()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 1024)  # block-3 truncation → 1024-d
    # train mode updates batch stats
    feats2, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_vit_factories():
    s = vit_small(image_size=32)
    assert s.dim == 384 and s.num_layers == 12
    l = vit_large(image_size=32)
    assert l.dim == 1024 and l.num_layers == 24
    params = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = s.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 4 + 1, 384)  # 2x2 grid + cls


def test_sample_generate_topk_topp():
    from moc_tpu.nn.decoder import sample_generate

    vocab, d, b, l = 23, 32, 2, 6
    dec = Decoder(CFG)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((b, 1, d)))
    emb = jax.random.normal(jax.random.PRNGKey(1), (vocab, d)) * 0.1
    head = jax.random.normal(jax.random.PRNGKey(2), (d, vocab)) * 2.0

    def embed_fn(tokens, idx):
        return emb[tokens][:, None, :]

    def logits_fn(h):
        return h[:, 0] @ head

    out = sample_generate(dec, params, embed_fn, logits_fn,
                          jax.random.PRNGKey(3), batch=b, seq_len=l,
                          bos_id=1, top_k=5, top_p=0.1, temperature=0.8)
    assert out.shape == (b, l)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < vocab))
    # top_k=1 must equal greedy
    g = greedy_generate(dec, params, embed_fn, logits_fn, batch=b, seq_len=l, bos_id=1)
    s = sample_generate(dec, params, embed_fn, logits_fn, jax.random.PRNGKey(9),
                        batch=b, seq_len=l, bos_id=1, top_k=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


def test_sample_generate_min_len_and_repetition_penalty():
    from moc_tpu.nn.decoder import sample_generate

    vocab, d, b, l = 23, 32, 2, 8
    dec = Decoder(CFG)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((b, 1, d)))
    emb = jax.random.normal(jax.random.PRNGKey(1), (vocab, d)) * 0.1
    head = jax.random.normal(jax.random.PRNGKey(2), (d, vocab))

    def embed_fn(tokens, idx):
        return emb[tokens][:, None, :]

    eos = 3

    def eos_loving_logits(h):
        base = h[:, 0] @ head
        return base.at[:, eos].add(100.0)  # EOS always wins greedily

    # min_len forbids EOS before 4 generated tokens, then it fires at once
    out = sample_generate(dec, params, embed_fn, eos_loving_logits,
                          jax.random.PRNGKey(3), batch=b, seq_len=l,
                          bos_id=1, eos_id=eos, top_k=1, min_len=4)
    out = np.asarray(out)
    assert not (out[:, :3] == eos).any()
    assert (out[:, 3] == eos).all()

    # repetition penalty: greedy decoding with a fixed winner token repeats
    # it forever without penalty, and cannot with a strong penalty
    def peaked_logits(h):
        base = jnp.zeros((h.shape[0], vocab))
        return base.at[:, 7].set(5.0).at[:, 8].set(4.0).at[:, 9].set(3.0)

    no_pen = np.asarray(sample_generate(
        dec, params, embed_fn, peaked_logits, jax.random.PRNGKey(4),
        batch=b, seq_len=4, bos_id=1, top_k=1))
    assert (no_pen == 7).all()
    pen = np.asarray(sample_generate(
        dec, params, embed_fn, peaked_logits, jax.random.PRNGKey(4),
        batch=b, seq_len=4, bos_id=1, top_k=1,
        repetition_penalty=10.0, vocab_size=vocab))
    # penalized greedy walks down the ranking instead of repeating
    np.testing.assert_array_equal(pen[0, :3], [7, 8, 9])

    # vocab_size required with penalty
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_generate(dec, params, embed_fn, peaked_logits,
                        jax.random.PRNGKey(5), batch=b, seq_len=2, bos_id=1,
                        repetition_penalty=2.0)


def test_generate_pads_after_eos():
    from moc_tpu.nn.decoder import greedy_generate

    vocab, d, b, l = 23, 32, 2, 6
    dec = Decoder(CFG)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((b, 1, d)))
    emb = jax.random.normal(jax.random.PRNGKey(1), (vocab, d)) * 0.1
    eos = 3

    def embed_fn(tokens, idx):
        return emb[tokens][:, None, :]

    def eos_logits(h):
        return jnp.zeros((h.shape[0], vocab)).at[:, eos].set(9.0)

    out = np.asarray(greedy_generate(dec, params, embed_fn, eos_logits,
                                     batch=b, seq_len=l, bos_id=1, eos_id=eos,
                                     pad_id=0))
    # EOS fires immediately, then pads (ref coca_model.py:318-320)
    assert (out[:, 0] == eos).all() and (out[:, 1:] == 0).all()


class _StubDecoder:
    """Pass-through 'decoder' so generation tests can rig an exact Markov
    chain: the hidden state IS the one-hot of the last token."""

    def init_cache(self, batch, max_len, dtype=None):
        return [(jnp.zeros((batch, 1)), jnp.zeros((batch, 1)))]

    def apply(self, params, x, memory, memory_mask, caches, idx):
        return x, caches


def test_beam_search_beats_greedy_on_rigged_chain():
    from moc_tpu.nn.decoder import beam_generate, greedy_generate

    # vocab: 0=bos, 1=A, 2=B, 3=eos, 4=D. NORMALIZED transition rows:
    # bos -> A .6, B .4 | A -> D .5, eos .1, bos .4 | B -> eos .9, bos .1
    # greedy: A (0.6) then D -> P=0.30; optimal: B then eos -> P=0.36
    V = 5
    M = np.full((V, V), 1e-6, np.float32)
    M[0, 1], M[0, 2] = 0.6, 0.4
    M[1, 4], M[1, 3], M[1, 0] = 0.5, 0.1, 0.4
    M[2, 3], M[2, 0] = 0.9, 0.1
    M[4, 3], M[4, 0] = 0.2, 0.8
    logM = jnp.asarray(np.log(M / M.sum(1, keepdims=True)))
    eye = jnp.eye(V)

    def embed_fn(tokens, idx):
        return eye[tokens][:, None, :]

    def logits_fn(h):
        return h[:, 0] @ logM  # exact next-token log-probs of the chain

    dec = _StubDecoder()
    greedy = np.asarray(greedy_generate(dec, {}, embed_fn, logits_fn,
                                        batch=1, seq_len=2, bos_id=0, eos_id=3))
    beam = np.asarray(beam_generate(dec, {}, embed_fn, logits_fn,
                                    batch=1, seq_len=2, bos_id=0, eos_id=3,
                                    beam_size=2))
    # greedy takes A then D (0.6*0.5=0.30); the true best is B,eos (0.36)
    np.testing.assert_array_equal(greedy[0], [1, 4])
    np.testing.assert_array_equal(beam[0], [2, 3])


def test_beam_size_one_equals_greedy():
    from moc_tpu.nn.decoder import beam_generate, greedy_generate

    vocab, d, b, l = 19, 32, 2, 7
    dec = Decoder(CFG)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((b, 1, d)))
    emb = jax.random.normal(jax.random.PRNGKey(1), (vocab, d)) * 0.1
    head = jax.random.normal(jax.random.PRNGKey(2), (d, vocab)) * 0.5

    def embed_fn(tokens, idx):
        return emb[tokens][:, None, :]

    def logits_fn(h):
        return h[:, 0] @ head

    g = np.asarray(greedy_generate(dec, params, embed_fn, logits_fn,
                                   batch=b, seq_len=l, bos_id=1, eos_id=2,
                                   pad_id=0))
    bm = np.asarray(beam_generate(dec, params, embed_fn, logits_fn,
                                  batch=b, seq_len=l, bos_id=1, eos_id=2,
                                  beam_size=1, pad_id=0))
    np.testing.assert_array_equal(g, bm)


def test_top_p_matches_hf_warper():
    """The nucleus filter reproduces HF TopPLogitsWarper (the warper the
    reference's generate delegates to): keep the sorted HEAD whose
    cumulative mass reaches top_p, INCLUDING the crossing token (review r3
    — the previous 'cum <= 1-top_p' kept the complement)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(0)
    for top_p in (0.1, 0.5, 0.9):
        logits = rng.normal(size=(3, 50)).astype(np.float32) * 2
        want = ~torch.isinf(
            TopPLogitsWarper(top_p=top_p)(None, torch.from_numpy(logits))
        ).numpy()
        # replicate sample_generate's filter inline (it is a closure)
        x = jnp.asarray(logits)
        order = jnp.argsort(-x, axis=-1)
        sorted_logits = jnp.take_along_axis(x, order, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < top_p
        keep_sorted = keep_sorted.at[..., 0].set(True)
        inv = jnp.argsort(order, axis=-1)
        got = np.asarray(jnp.take_along_axis(keep_sorted, inv, axis=-1))
        np.testing.assert_array_equal(got, want, err_msg=f"top_p={top_p}")
