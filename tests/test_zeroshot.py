"""Tests for the zero-shot stack: tokenizer protocol, prompt banks,
classifier building, and torch-checkpoint conversion parity.

The conversion parity tests use the REFERENCE torch modules (text tower and
attentional pooler import without timm) as oracles: random torch weights →
state-dict → converter → flax forward must match the torch forward. Skipped
when ``/root/reference`` is unavailable (end-user installs).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.zeroshot import (
    CoCa,
    CoCaConfig,
    ConchTokenizer,
    TextConfig,
    TextTower,
    VisionConfig,
    build_zero_shot_classifier,
    cached_zero_shot_classifier,
)
from moc_tpu.zeroshot.convert import convert_text_tower, _pooler
from moc_tpu.zeroshot.prompts import PromptBank, load_prompt_bank, make_prompt_bank, save_prompt_bank

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models"))


def test_tokenizer_protocol():
    tk = ConchTokenizer()  # hash fallback
    ids = tk(["a photomicrograph showing lung adenocarcinoma.", "tumor"])
    assert ids.shape == (2, 128)
    assert ids.dtype == np.int32
    # final slot is the placeholder pad
    assert (ids[:, -1] == tk.pad_id).all()
    # deterministic
    np.testing.assert_array_equal(ids, tk(["a photomicrograph showing lung adenocarcinoma.", "tumor"]))


def test_prompt_bank_roundtrip(tmp_path):
    bank = make_prompt_bank(
        {"LUAD": ["lung adenocarcinoma", "adenocarcinoma of the lung"],
         "LUSC": ["lung squamous cell carcinoma"]},
        ["CLASSNAME.", "an image of CLASSNAME."],
        {"LUAD": 0, "LUSC": 1},
    )
    assert bank.n_classes == 2
    texts = bank.texts_for_class(0)
    assert texts[0] == ["lung adenocarcinoma.", "an image of lung adenocarcinoma."]
    p = str(tmp_path / "bank.json")
    save_prompt_bank(p, bank)
    back = load_prompt_bank(p, {"LUAD": 0, "LUSC": 1})
    assert back == bank


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference prompts not available")
def test_load_reference_prompt_bank():
    bank = load_prompt_bank(
        os.path.join(REFERENCE, "models/prompts/nsclc_prompts_w4normal.json"),
        {"LUAD": 0, "LUSC": 1, "Stroma": 2, "Inflammation": 3, "Vascular": 4, "Necrosis": 5},
    )
    assert bank.n_classes == 6
    assert any("CLASSNAME" in t for t in bank.templates)


def test_build_classifier_normalization():
    d = 16

    def encode(ids):  # deterministic fake encoder: hash of ids row → direction
        out = []
        for row in np.asarray(ids):
            rng = np.random.default_rng(int(row.sum()) % 2**31)
            v = rng.normal(size=d)
            out.append(v / np.linalg.norm(v))
        return jnp.asarray(np.stack(out), jnp.float32)

    bank = make_prompt_bank(
        {"A": ["alpha", "ay"], "B": ["beta"]},
        ["CLASSNAME.", "an image of CLASSNAME."],
        {"A": 0, "B": 1},
    )
    w = build_zero_shot_classifier(encode, ConchTokenizer(), bank)
    assert w.shape == (d, 2)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, rtol=1e-5)


def test_cached_classifier(tmp_path):
    calls = {"n": 0}

    def encode(ids):
        calls["n"] += 1
        return jnp.ones((ids.shape[0], 8)) / np.sqrt(8)

    bank = make_prompt_bank({"A": ["a"]}, ["CLASSNAME"], {"A": 0})
    p = str(tmp_path / "w.npz")
    w1 = cached_zero_shot_classifier(p, encode, ConchTokenizer(), bank)
    w2 = cached_zero_shot_classifier(p, encode, ConchTokenizer(), bank)
    assert calls["n"] == 1  # second call served from cache
    np.testing.assert_array_equal(w1, w2)


SMALL_TEXT = TextConfig(context_length=16, vocab_size=211, width=32, heads=4,
                        layers=2, output_dim=24)


def _ref_transformer_module():
    """Load the reference transformer.py standalone (its package __init__
    pulls in timm, which this environment lacks; the module itself only
    needs torch)."""
    import importlib.util

    path = os.path.join(REFERENCE, "models/conch/open_clip_custom/transformer.py")
    spec = importlib.util.spec_from_file_location("ref_conch_transformer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_text_tower():
    import torch

    TextTransformer = _ref_transformer_module().TextTransformer

    torch.manual_seed(0)
    model = TextTransformer(
        context_length=SMALL_TEXT.context_length, vocab_size=SMALL_TEXT.vocab_size,
        width=SMALL_TEXT.width, heads=SMALL_TEXT.heads, layers=SMALL_TEXT.layers,
        output_dim=SMALL_TEXT.output_dim, embed_cls=True, output_tokens=False,
    )
    model.eval()
    return model


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference torch modules unavailable")
def test_text_tower_conversion_parity():
    import torch

    model = _torch_text_tower()
    sd = {f"text.{k}": v for k, v in model.state_dict().items()}
    params = {"params": convert_text_tower(sd, "text")}

    rng = np.random.default_rng(0)
    # 15 = context-1 real tokens, trailing pads (pad_id 0)
    ids = np.zeros((3, SMALL_TEXT.context_length - 1), np.int64)
    for i in range(3):
        n = rng.integers(3, 10)
        ids[i, :n] = rng.integers(1, SMALL_TEXT.vocab_size, size=n)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).numpy()

    tower = TextTower(SMALL_TEXT)
    got = np.asarray(tower.apply(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference torch modules unavailable")
def test_attentional_pooler_conversion_parity():
    import torch

    AttentionalPooler = _ref_transformer_module().AttentionalPooler

    torch.manual_seed(1)
    d_model, context_dim, n_q = 24, 40, 3
    ref_pool = AttentionalPooler(d_model=d_model, context_dim=context_dim,
                                 n_head=4, n_queries=n_q)
    ref_pool.eval()
    sd = {f"p.{k}": v for k, v in ref_pool.state_dict().items()}
    params = {"params": _pooler(sd, "p", d_model)}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, context_dim)).astype(np.float32)
    with torch.no_grad():
        ref = ref_pool(torch.from_numpy(x)).numpy()

    from moc_tpu.nn.transformer import AttentionalPooler as FlaxPooler

    pool = FlaxPooler(dim=d_model, context_dim=context_dim, num_heads=4, n_queries=n_q)
    got = np.asarray(pool.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_coca_smoke_small():
    """Random-init CoCa: shapes + normalization, tiny config."""
    cfg = CoCaConfig(
        text=SMALL_TEXT,
        vision=VisionConfig(image_size=32, patch_size=16, width=24, layers=1,
                            heads=4, embed_dim_contrast=24, embed_dim_caption=24,
                            pooler_heads=4, n_queries_caption=5),
    )
    model = CoCa(cfg)
    ids = np.zeros((2, SMALL_TEXT.context_length), np.int32)
    ids[:, 0] = 5
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, ids)
    img_e, txt_e, scale = model.apply(params, imgs, ids)
    assert img_e.shape == (2, 24) and txt_e.shape == (2, SMALL_TEXT.output_dim)
    np.testing.assert_allclose(np.linalg.norm(img_e, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt_e, axis=1), 1.0, rtol=1e-5)
    assert float(scale) > 0


def test_coca_captioner_trains_and_generates():
    """Caption decoder: teacher-forced loss decreases; generation runs."""
    import optax

    from moc_tpu.zeroshot.captioner import CaptionerConfig, CoCaCaptioner, generate_caption

    cfg = CaptionerConfig(vocab_size=50, width=32, layers=2, heads=4,
                          context_length=16)
    model = CoCaCaptioner(cfg)
    rng = np.random.default_rng(0)
    caption_tokens = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    # fixed target captions
    ids = jnp.asarray(np.array([[1, 5, 6, 7, 2, 0, 0, 0],
                                [1, 9, 9, 4, 2, 0, 0, 0]], np.int32))
    params = model.init(jax.random.PRNGKey(0), ids, caption_tokens)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, ids, caption_tokens, method=model.caption_loss)
        )(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(10):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    out = generate_caption(model, params, caption_tokens, seq_len=8)
    assert out.shape == (2, 8)
    out_s = generate_caption(model, params, caption_tokens, seq_len=8,
                             mode="sample", rng=jax.random.PRNGKey(1),
                             top_k=5, temperature=0.7)
    assert out_s.shape == (2, 8)
