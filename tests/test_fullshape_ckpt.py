"""Full-shape fabricated-checkpoint drills (no real weights needed).

VERDICT r2 #3: nothing exercised the converters at **release shapes** — all
oracle tests run reduced sizes, so a key/shape/layout bug that only appears
at the published-checkpoint scale (e.g. torch ``nn.MultiheadAttention``
switching to a FUSED ``in_proj_weight`` when ``kdim == embed_dim``, which the
caption pooler hits at 768/768 but no small-shape test ever did) would
survive to the day a real checkpoint lands.

These drills synthesize random ``state_dict``s with the exact release
layouts, write them with ``torch.save``, and run the real load paths:

* CONCH ``conch_ViT-B-16.json`` (ref ``models/conch/open_clip_custom/
  factory.py:32-113``, ``model_configs/conch_ViT-B-16.json``): 448px ViT-B/16
  timm trunk (28x28+1 pos grid), 12L/768w text with vocab 32007 / context 128
  / fused ``in_proj``, 1-query contrast pooler (512 over 768 -> separate
  q/k/v) and 256-query caption pooler (768/768 -> fused ``in_proj_weight``),
  plus ``text_decoder.*`` keys the converter must tolerate.  Text tower and
  poolers are built from the REFERENCE torch modules themselves (they import
  without timm), so those parts also get numerical parity at full shape; the
  timm trunk (timm absent here) is fabricated key-by-key after
  ``timm.models.vision_transformer.VisionTransformer`` (``coca_model.py:76-90``).
* MUSK ``musk_large_patch16_384`` (ref ``models/musk/modeling.py:182-231``):
  the reference torch model is instantiated directly (fairscale/timm stubs
  from ``test_musk_oracle``), state-dict saved under the release ``{"model":
  ...}`` nesting, loaded with ``load_musk``, and checked for full tree match
  plus vision+text embedding parity at 384px/24L/1024w.

Stages mirror ``test_realckpt.py`` minus the real-AUC diff: checkpoint ->
flax params -> text-encode -> zero-shot weight matrices over the vendored
NSCLC/RCC banks.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_musk_oracle import _install_stubs
from tests.test_zeroshot import _ref_transformer_module

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models"))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAS_REFERENCE, reason="reference torch modules unavailable"),
]


def _flat_shapes(tree):
    return {
        jax.tree_util.keystr(k, simple=True, separator="/"): tuple(v.shape)
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    }


# --------------------------------------------------------------------------
# CONCH conch_ViT-B-16 at release shapes
# --------------------------------------------------------------------------

WIDTH, LAYERS = 768, 12
GRID = 448 // 16  # 28


def _fabricate_conch_state_dict():
    """Release-layout CoCa state dict; returns (sd, torch text, torch poolers)."""
    mod = _ref_transformer_module()
    torch.manual_seed(0)
    text = mod.TextTransformer(
        context_length=128, vocab_size=32007, width=WIDTH, heads=12,
        layers=LAYERS, output_dim=512, embed_cls=True, output_tokens=False,
    ).eval()
    # contrast pooler: d_model 512 != context 768 -> separate q/k/v_proj_weight
    pool_contrast = mod.AttentionalPooler(
        d_model=512, context_dim=WIDTH, n_head=8, n_queries=1).eval()
    # caption pooler: 768 == 768 -> torch packs a fused in_proj_weight
    pool_caption = mod.AttentionalPooler(
        d_model=WIDTH, context_dim=WIDTH, n_head=8, n_queries=256).eval()
    assert "attn.in_proj_weight" in pool_caption.state_dict(), (
        "drill premise: fused layout expected at 768/768")

    sd = {f"text.{k}": v for k, v in text.state_dict().items()}
    sd.update({f"visual.attn_pool_contrast.{k}": v
               for k, v in pool_contrast.state_dict().items()})
    sd.update({f"visual.attn_pool_caption.{k}": v
               for k, v in pool_caption.state_dict().items()})

    g = torch.Generator().manual_seed(1)

    def rnd(*shape, std=0.02):
        return torch.randn(*shape, generator=g) * std

    # timm VisionTransformer trunk, release layout (coca_model.py:76-90)
    sd["visual.trunk.cls_token"] = rnd(1, 1, WIDTH)
    sd["visual.trunk.pos_embed"] = rnd(1, GRID * GRID + 1, WIDTH)
    sd["visual.trunk.patch_embed.proj.weight"] = rnd(WIDTH, 3, 16, 16)
    sd["visual.trunk.patch_embed.proj.bias"] = torch.zeros(WIDTH)
    for i in range(LAYERS):
        p = f"visual.trunk.blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(WIDTH)
        sd[f"{p}.norm1.bias"] = torch.zeros(WIDTH)
        sd[f"{p}.attn.qkv.weight"] = rnd(3 * WIDTH, WIDTH)
        sd[f"{p}.attn.qkv.bias"] = torch.zeros(3 * WIDTH)
        sd[f"{p}.attn.proj.weight"] = rnd(WIDTH, WIDTH)
        sd[f"{p}.attn.proj.bias"] = torch.zeros(WIDTH)
        sd[f"{p}.norm2.weight"] = torch.ones(WIDTH)
        sd[f"{p}.norm2.bias"] = torch.zeros(WIDTH)
        sd[f"{p}.mlp.fc1.weight"] = rnd(4 * WIDTH, WIDTH)
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(4 * WIDTH)
        sd[f"{p}.mlp.fc2.weight"] = rnd(WIDTH, 4 * WIDTH)
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(WIDTH)
    sd["visual.trunk.norm.weight"] = torch.ones(WIDTH)
    sd["visual.trunk.norm.bias"] = torch.zeros(WIDTH)
    sd["visual.ln_contrast.weight"] = torch.ones(512)
    sd["visual.ln_contrast.bias"] = torch.zeros(512)
    sd["visual.proj_contrast"] = rnd(512, 512, std=512 ** -0.5)
    sd["visual.ln_caption.weight"] = torch.ones(WIDTH)
    sd["visual.ln_caption.bias"] = torch.zeros(WIDTH)
    sd["logit_scale"] = torch.tensor(float(np.log(1 / 0.07)))
    # caption-decoder keys present in release checkpoints; converter must
    # ignore them (convert.py module docstring)
    sd["text_decoder.resblocks.0.ln_1.weight"] = torch.ones(WIDTH)
    sd["text_decoder.resblocks.0.ln_1.bias"] = torch.zeros(WIDTH)
    sd["text_decoder.cross_attn.0.attn.in_proj_weight"] = rnd(3 * WIDTH, WIDTH)
    sd["text_decoder.ln_final.weight"] = torch.ones(WIDTH)
    sd["text_decoder.text_projection"] = rnd(WIDTH, 32007)
    return sd, text, pool_contrast, pool_caption


@pytest.fixture(scope="module")
def conch(tmp_path_factory):
    from moc_tpu.zeroshot import load_conch

    sd, text, pool_contrast, pool_caption = _fabricate_conch_state_dict()
    path = str(tmp_path_factory.mktemp("conch") / "pytorch_model.bin")
    # release nesting: {"state_dict": {"module.<k>": v}} (factory.py:17-30)
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, path)
    model, params = load_conch(path)
    return model, params, sd, text, pool_contrast, pool_caption


def test_conch_tree_matches_init(conch):
    """Converted tree == flax init tree, at full release shapes."""
    model, params = conch[0], conch[1]
    init = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 448, 448, 3), jnp.float32),
        jnp.zeros((1, 128), jnp.int32),
    )
    assert _flat_shapes(init) == _flat_shapes(params)


def test_conch_text_parity_full_shape(conch):
    """12L/768w text tower forward parity at vocab 32007 / context 128."""
    from moc_tpu.zeroshot import TextConfig, TextTower

    params, text = conch[1], conch[3]
    rng = np.random.default_rng(0)
    ids = np.zeros((3, 127), np.int64)
    for i in range(3):
        n = int(rng.integers(5, 30))
        ids[i, :n] = rng.integers(1, 32007, size=n)
    with torch.no_grad():
        ref = text(torch.from_numpy(ids)).numpy()
    tower = TextTower(TextConfig())
    got = np.asarray(tower.apply({"params": params["params"]["text"]},
                                 jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("which,dim", [("contrast", 512), ("caption", WIDTH)])
def test_conch_pooler_parity_full_shape(conch, which, dim):
    """Both release pooler layouts: separate q/k/v (512 over 768) and the
    fused ``in_proj_weight`` the caption pooler uses at 768/768."""
    from moc_tpu.nn.transformer import AttentionalPooler as FlaxPooler

    params = conch[1]
    ref_pool = conch[4] if which == "contrast" else conch[5]
    n_q = 1 if which == "contrast" else 256
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, GRID * GRID + 1, WIDTH)).astype(np.float32)
    with torch.no_grad():
        ref = ref_pool(torch.from_numpy(x)).numpy()
    pool = FlaxPooler(dim=dim, context_dim=WIDTH, num_heads=8, n_queries=n_q)
    got = np.asarray(pool.apply(
        {"params": params["params"]["visual"][f"attn_pool_{which}"]},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_conch_zero_shot_banks_full_shape(conch, tmp_path):
    """text-encode -> NSCLC/RCC weight matrices from the vendored banks
    (the ``test_realckpt.py`` stages minus the real-weights AUC diff)."""
    from moc_tpu.config import DEFAULT_PROMPT_ROOT, PRESETS
    from moc_tpu.zeroshot import (
        ConchTokenizer,
        cached_zero_shot_classifier,
        load_prompt_bank,
    )
    from moc_tpu.zeroshot.classifier import make_encode_text_fn

    model, params = conch[0], conch[1]
    encode = make_encode_text_fn(model, params)
    tokenizer = ConchTokenizer()  # hash fallback; ids land in [0, 32007)
    for name in ("nsclc", "rcc"):
        preset = PRESETS[name]
        bank = load_prompt_bank(
            os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file),
            preset.label_dict)
        w = cached_zero_shot_classifier(
            str(tmp_path / f"w_{name}.npz"), encode, tokenizer, bank,
            use_cache=False)
        assert w.shape == (512, preset.n_classes)
        assert np.isfinite(w).all()
        np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-4)
        # distinct classes must not collapse to one direction
        gram = np.asarray(w).T @ np.asarray(w)
        off = gram[~np.eye(preset.n_classes, dtype=bool)]
        assert (np.abs(off) < 0.999).all()


def test_conch_image_encode_full_shape(conch):
    """One real 448px forward through the converted vision tower."""
    model, params = conch[0], conch[1]
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(2, 448, 448, 3)).astype(np.float32)
    emb = np.asarray(model.apply(params, jnp.asarray(imgs),
                                 method=model.encode_image))
    assert emb.shape == (2, 512)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    assert abs(float(emb[0] @ emb[1])) < 0.999


def test_conch_pos_resample_on_224_checkpoint(conch):
    """A 224px-trained checkpoint (14x14+1 grid) loads at 448 via bilinear
    pos-embed resampling (ref ``coca_model.py:348-370``)."""
    from moc_tpu.zeroshot.convert import convert_conch_checkpoint

    sd = dict(conch[2])
    g = torch.Generator().manual_seed(3)
    sd["visual.trunk.pos_embed"] = torch.randn(1, 14 * 14 + 1, WIDTH,
                                               generator=g) * 0.02
    params = convert_conch_checkpoint(sd, image_size=448)
    assert params["params"]["visual"]["trunk"]["pos_embed"].shape[-2:] == (
        GRID * GRID + 1, WIDTH)


# --------------------------------------------------------------------------
# MUSK musk_large_patch16_384 at release shapes
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def musk(tmp_path_factory):
    _install_stubs()
    path = os.path.join(REFERENCE, "models")
    if path not in sys.path:
        sys.path.insert(0, path)
    from musk.modeling import musk_large_patch16_384

    from moc_tpu.zeroshot.convert_musk import load_musk

    torch.manual_seed(0)
    tmodel = musk_large_patch16_384().eval()
    ckpt = str(tmp_path_factory.mktemp("musk") / "musk_large_patch16_384.pth")
    # release nesting: {"model": state_dict} (musk/utils.py load path)
    torch.save({"model": tmodel.state_dict()}, ckpt)
    model, params = load_musk(ckpt)
    return tmodel, model, params


def test_musk_tree_matches_init(musk):
    _, model, params = musk
    init = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        images=jnp.zeros((1, 384, 384, 3), jnp.float32),
        token_ids=jnp.zeros((1, 100), jnp.int32),
    )
    assert _flat_shapes(init) == _flat_shapes(params)


def test_musk_full_shape_embedding_parity(musk):
    """Vision (384px, 577 tokens, 24L) + text head-normalized embeddings
    match the reference torch model bit-for-layout at release scale."""
    tmodel, model, params = musk
    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 3, 384, 384)).astype(np.float32)
    toks = rng.integers(0, 64010, size=(1, 40))
    pad = np.zeros((1, 40), bool)
    pad[0, 33:] = True
    with torch.no_grad():
        tv, tt = tmodel(image=torch.from_numpy(img),
                        text_description=torch.from_numpy(toks),
                        padding_mask=torch.from_numpy(pad),
                        return_global=True, with_head=True, out_norm=True)
    jv, jt, scale = model.apply(
        params, images=np.transpose(img, (0, 2, 3, 1)),
        token_ids=toks, text_padding_mask=pad, normalize=True)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), rtol=2e-3, atol=1e-3)
    assert np.isclose(float(scale), float(tmodel.logit_scale.detach().exp()))


def test_musk_pos_interpolation_to_224(musk):
    """Loading the 384 checkpoint at a 224 grid bicubic-interpolates the
    vision positions (ref ``musk/utils.py:193-235``)."""
    from moc_tpu.zeroshot.convert_musk import convert_musk_checkpoint

    tmodel = musk[0]
    params = convert_musk_checkpoint(tmodel.state_dict(), num_patches=196)
    assert params["params"]["beit3"]["vision_pos"].shape == (197, 1024)


def test_extract_features_cli_with_fullshape_conch(conch, tmp_path):
    """The extraction CLI end-to-end with a release-layout CONCH checkpoint:
    raw 448px patch bags → cli.extract_features --backbone conch →
    BagLoader-schema 512-d unit-norm feature bags."""
    import h5py
    import torch as _torch

    from moc_tpu.cli import extract_features as ef
    from moc_tpu.data.bags import read_bag_h5

    sd = conch[2]
    ckpt = str(tmp_path / "conch.bin")
    _torch.save({"state_dict": sd}, ckpt)

    patch_dir = tmp_path / "patches" / "h5_files"
    patch_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    with h5py.File(patch_dir / "s.h5", "w") as f:
        f.create_dataset("imgs", data=(rng.random((5, 448, 448, 3)) * 255)
                         .astype(np.uint8))
        f.create_dataset("coords", data=rng.integers(0, 99999, (5, 2))
                         .astype(np.int32))

    out = tmp_path / "features"
    rc = ef.main(["--patch_dir", str(tmp_path / "patches"),
                  "--out_dir", str(out), "--backbone", "conch",
                  "--checkpoint", ckpt, "--batch_size", "4",
                  "--platform", "cpu"])
    assert rc == 0
    bag = read_bag_h5(str(out / "h5_files" / "s.h5"))
    assert bag.features.shape == (5, 512)
    assert np.isfinite(bag.features).all()
    np.testing.assert_allclose(np.linalg.norm(bag.features, axis=1), 1.0,
                               atol=1e-4)
    # distinct patches must not collapse
    gram = bag.features @ bag.features.T
    assert (np.abs(gram[~np.eye(5, dtype=bool)]) < 0.999).all()
