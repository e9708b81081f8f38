"""Tests for ViLa-MIL, adapters, LoRA, and the TITAN-style head."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from moc_tpu.models import (
    AMUAdapter,
    AdapterConfig,
    ClipAdapter,
    MoEClipAdapter,
    PromptConstants,
    TipAdapter,
    TitanConfig,
    TitanHead,
    ViLaMIL,
    VilaConfig,
    build_prompt_constants,
    count_trainable,
    linear_adapter_init,
    lora_optimizer,
    merge_lora,
    uncertainty,
    zero_shot_pooled,
)
from moc_tpu.nn import VisionTransformer
from moc_tpu.zeroshot import ConchTokenizer
from moc_tpu.zeroshot.text_tower import TextConfig


def _bag(seed, n=128, n_valid=100, d=512):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats[n_valid:] = 0.0
    valid = np.arange(n) < n_valid
    return jnp.asarray(feats), jnp.asarray(valid)


SMALL_TEXT = TextConfig(context_length=128, vocab_size=32007, width=64,
                        heads=4, layers=2, output_dim=32)


@pytest.mark.slow
def test_vila_mil_forward_and_grads():
    rng = np.random.default_rng(0)
    tk = ConchTokenizer()
    emb_table = rng.normal(size=(32007, 64)).astype(np.float32) * 0.02
    long = "an image patch of tumor tissue showing irregular glandular structures with "\
        "enlarged nuclei prominent nucleoli abundant eosinophilic cytoplasm at SCALE magnification consistent with TYPE carcinoma"
    names = [long.replace("TYPE", t).replace("SCALE", s)
             for s in ("low", "high") for t in ("adenocarcinoma", "squamous")]
    prompts = build_prompt_constants(emb_table, tk, names)
    assert prompts.token_prefix.shape == (4, 1, 64)
    assert prompts.token_suffix.shape == (4, 128 - 17, 64)

    cfg = VilaConfig(n_classes=2, input_size=32, hidden_size=24,
                     prototype_number=4, text=SMALL_TEXT)
    xs, ms = _bag(1, d=32)
    xl, ml = _bag(2, d=32)
    model = ViLaMIL(cfg)
    params = model.init(jax.random.PRNGKey(0), xs, ms, xl, ml, prompts)
    out = model.apply(params, xs, ms, xl, ml, prompts)
    assert out["logits"].shape == (2,)
    assert out["text_features"].shape == (4, 32)

    def loss(p):
        return model.apply(p, xs, ms, xl, ml, prompts)["logits"][0]

    grads = jax.grad(loss)(params)
    # the learnable context vectors must receive gradient through the text tower
    assert float(jnp.abs(grads["params"]["ctx"]).sum()) > 0
    assert float(jnp.abs(grads["params"]["learnable_image_center"]).sum()) > 0


def test_clip_and_tip_adapters():
    feats, valid = _bag(3)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(512, 2)).astype(np.float32))
    clip_ada = ClipAdapter(AdapterConfig())
    p = clip_ada.init(jax.random.PRNGKey(0), feats, valid, w)
    out = clip_ada.apply(p, feats, valid, w)
    assert out.shape == (2,)

    cache = linear_adapter_init(np.asarray(feats[:8]), np.array([0, 1] * 4), 2, 512)
    tip = TipAdapter(AdapterConfig(), cache_init=tuple(map(tuple, cache)))
    p2 = tip.init(jax.random.PRNGKey(0), feats, valid, w)
    np.testing.assert_allclose(np.asarray(p2["params"]["cache_kernel"]), cache, rtol=1e-6)
    out2 = tip.apply(p2, feats, valid, w)
    assert np.all(np.isfinite(np.asarray(out2)))
    # disable-ada baseline
    zs = zero_shot_pooled(feats, valid, w)
    assert zs.shape == (2,)


def test_moe_adapter_balance_loss():
    feats, valid = _bag(5)
    w = jnp.asarray(np.random.default_rng(6).normal(size=(512, 3)).astype(np.float32))
    moe = MoEClipAdapter(AdapterConfig(n_classes=3), n_experts=4,
                         use_switch_gate=True, use_balance_loss=True)
    p = moe.init(jax.random.PRNGKey(0), feats, valid, w)
    pooled, bal = moe.apply(p, feats, valid, w)
    assert pooled.shape == (3,)
    # reference semantics (SwitchGate.forward): the Switch-Transformer loss
    # is computed on the top-1-MASKED gate scores — restate it in numpy
    norm = np.linalg.norm(np.asarray(feats), axis=-1, keepdims=True)
    f = np.asarray(feats) / np.maximum(norm, 1e-12)  # pad rows: norm 0
    gk = np.asarray(p["params"]["gate"]["kernel"])
    logits = f @ gk
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    top1 = probs.argmax(-1)
    onehot = np.eye(4)[top1]
    masked = probs * onehot
    v = np.asarray(valid, bool)
    want = (np.mean(onehot[v], axis=0) * np.mean(masked[v], axis=0)).sum() * 4
    np.testing.assert_allclose(float(bal), want, rtol=1e-5)


def test_amu_adapter_uncertainty_types():
    feats, valid = _bag(7)
    aux = jnp.asarray(np.random.default_rng(8).normal(size=(128, 1024)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(9).normal(size=(512, 2)).astype(np.float32))
    for kind in ["none", "entropy", "max", "max-min", "var", "energy", "moment"]:
        amu = AMUAdapter(AdapterConfig(), uncertainty_type=kind)
        p = amu.init(jax.random.PRNGKey(0), feats, valid, aux, w)
        pooled, pooled_aux = amu.apply(p, feats, valid, aux, w)
        assert np.all(np.isfinite(np.asarray(pooled))), kind
        assert np.all(np.isfinite(np.asarray(pooled_aux))), kind


def test_uncertainty_shapes():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32))
    for kind in ["entropy", "max", "var", "top5", "none"]:
        u = uncertainty(logits, kind, 1.0)
        assert u.shape == (10, 1)


def test_lora_vit_mask_and_merge():
    vit = VisionTransformer(image_size=32, patch_size=16, dim=64, num_layers=3,
                            num_heads=4, lora_rank=4, lora_last_n=2)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), imgs)
    # only the last 2 of 3 blocks carry LoRA params
    blocks = params["params"]["blocks"]
    assert "lora_a_q" not in blocks["resblocks_0"]["attn"]
    assert "lora_a_q" in blocks["resblocks_1"]["attn"]
    assert "lora_a_q" in blocks["resblocks_2"]["attn"]

    trainable, total = count_trainable(params)
    assert 0 < trainable < total

    # optimizer updates only LoRA params
    opt = lora_optimizer(optax.sgd(0.1), params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    base_update = updates["params"]["blocks"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
    lora_update = updates["params"]["blocks"]["resblocks_2"]["attn"]["lora_a_q"]
    assert float(jnp.abs(base_update).sum()) == 0.0
    assert float(jnp.abs(lora_update).sum()) > 0.0

    # B=0 at init → merged model == base forward; after B changes it differs
    out_lora = vit.apply(params, imgs)
    merged = merge_lora(params["params"])
    vit_plain = VisionTransformer(image_size=32, patch_size=16, dim=64,
                                  num_layers=3, num_heads=4)
    out_merged = vit_plain.apply({"params": merged}, imgs)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_merged),
                               rtol=1e-5, atol=1e-6)


def test_titan_head():
    rng = np.random.default_rng(10)
    n = 128
    feats = jnp.asarray(rng.normal(size=(n, 512)).astype(np.float32))
    coords = jnp.asarray((rng.integers(0, 50, size=(n, 2)) * 512).astype(np.int32))
    valid = jnp.asarray(np.arange(n) < 90)
    model = TitanHead(TitanConfig(n_classes=3))
    params = model.init(jax.random.PRNGKey(0), feats, coords, valid)
    out = model.apply(params, feats, coords, valid)
    assert out["logits"].shape == (3,)
    assert out["slide_embedding"].shape == (512,)
    # coords matter: permuting coords changes the embedding
    coords2 = coords[::-1]
    out2 = model.apply(params, feats, coords2, valid)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


def test_block_lora_residual():
    """Whole-block residual LoRA (ref Block_LoRA, lora.py:193-244): zero-B
    init is a no-op vs the plain model; the lora mask marks the new params
    trainable; a nonzero B changes the output."""
    from moc_tpu.models.lora import lora_mask
    from moc_tpu.nn.vit import VisionTransformer

    vit = VisionTransformer(image_size=32, patch_size=16, dim=64, num_layers=3,
                            num_heads=4, block_lora_rank=4, lora_last_n=2)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), imgs)
    blocks = params["params"]["blocks"]
    assert "lora_block_a" not in blocks["resblocks_0"]
    assert "lora_block_a" in blocks["resblocks_2"]

    # zero-B init: identical to the plain model on shared params
    plain = VisionTransformer(image_size=32, patch_size=16, dim=64,
                              num_layers=3, num_heads=4)
    stripped = jax.tree_util.tree_map(lambda x: x, params)
    for blk in stripped["params"]["blocks"].values():
        blk.pop("lora_block_a", None)
        blk.pop("lora_block_b", None)
    out_lora = vit.apply(params, imgs)
    out_plain = plain.apply(stripped, imgs)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_plain),
                               atol=1e-6)

    mask = lora_mask(params)
    assert mask["params"]["blocks"]["resblocks_2"]["lora_block_b"] is True
    assert mask["params"]["blocks"]["resblocks_2"]["attn"]["in_proj"]["kernel"] is False

    p2 = jax.tree_util.tree_map(lambda x: x, params)
    b_shape = p2["params"]["blocks"]["resblocks_2"]["lora_block_b"].shape
    # random B (a constant B is a per-token uniform shift that the final
    # LayerNorm's mean subtraction would cancel)
    p2["params"]["blocks"]["resblocks_2"]["lora_block_b"] = jnp.asarray(
        np.random.default_rng(1).normal(size=b_shape).astype(np.float32) * 0.1)
    out2 = vit.apply(p2, imgs)
    assert float(jnp.abs(out2 - out_lora).max()) > 1e-3


def test_gt_mask_fewshot_init():
    """Mask-filtered few-shot aux init (ref init_adapter_weight_c16wGT)."""
    from moc_tpu.models import fewshot_aux_features, gt_mask_keep

    rng = np.random.default_rng(0)
    # 10k x 10k slide, 100x100 bitmap with tumor in the top-left quadrant
    mask = np.zeros((100, 100), np.uint8)
    mask[:50, :50] = 1
    coords = np.array([[100, 100], [6000, 6000], [4900, 100], [100, 4900]])
    keep = gt_mask_keep(coords, (10000, 10000), mask, patch_size=224)
    # first patch inside; second outside; third/fourth straddle the border
    assert keep[0] and not keep[1]
    assert keep[2] and keep[3]  # windows overlap the tumor edge

    tumor = rng.normal(size=(4, 16)).astype(np.float32)
    normal = rng.normal(size=(3, 16)).astype(np.float32)
    aux, labels = fewshot_aux_features([tumor, normal], [1, 0],
                                       keeps=[keep, None])
    assert aux.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(aux), 1.0, rtol=1e-6)
    np.testing.assert_array_equal(labels, [1, 0])
    # filtered variant differs from the unfiltered one
    aux_all, _ = fewshot_aux_features([tumor, normal], [1, 0])
    assert np.abs(aux - aux_all).max() > 1e-6


def test_moe_lora_identity_at_init_and_trainable():
    """lora_experts>1 = working MOELoRA (the reference's is a broken copy of
    plain LoRA, ``lora.py:107-168``): zero-init B + zero-init router make the
    wrapped attention exactly the base forward; mixture params and router are
    marked trainable by the lora mask; gradients reach every expert and the
    router."""
    from moc_tpu.models.lora import count_trainable, lora_mask
    from moc_tpu.nn.transformer import Attention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    base = Attention(32, 4)
    moe = Attention(32, 4, lora_rank=4, lora_experts=3)
    pb = base.init(jax.random.PRNGKey(0), x)
    pm = moe.init(jax.random.PRNGKey(0), x)
    # same base init (same rng stream order for in/out projections)
    np.testing.assert_allclose(
        np.asarray(moe.apply(pm, x)), np.asarray(base.apply(pb, x)),
        rtol=1e-6, atol=1e-6)

    mask = lora_mask(pm)["params"]
    assert mask["lora_moe_a_q"] and mask["lora_router"]
    assert not mask["in_proj"]["kernel"]
    n_train, n_total = count_trainable(pm)
    assert 0 < n_train < n_total

    def loss(p):
        return jnp.sum(moe.apply(p, x) ** 2)

    g = jax.grad(loss)(pm)["params"]
    # B zero-init blocks router/B-gradients only through the zero path;
    # A-gradients must be nonzero, and after one step of B, router flows too
    assert float(jnp.abs(g["lora_moe_b_q"]).sum()) > 0
    pm2 = jax.tree.map(lambda a: a, pm)
    pm2["params"]["lora_moe_b_q"] = jnp.ones_like(pm2["params"]["lora_moe_b_q"]) * 0.01
    g2 = jax.grad(loss)(pm2)["params"]
    assert float(jnp.abs(g2["lora_router"]).sum()) > 0
    assert float(jnp.abs(g2["lora_moe_a_q"]).sum()) > 0


def test_moe_lora_reduces_to_single_expert():
    """Identical expert pairs + the zero router's uniform gate reproduce the
    single-expert LoRA forward exactly."""
    from moc_tpu.nn.transformer import Attention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 7, 16)).astype(np.float32))
    single = Attention(16, 2, lora_rank=3)
    moe = Attention(16, 2, lora_rank=3, lora_experts=4)
    ps = single.init(jax.random.PRNGKey(2), x)
    pm = moe.init(jax.random.PRNGKey(2), x)
    ps["params"]["lora_b_q"] = jnp.asarray(
        rng.normal(size=(3, 16)).astype(np.float32))
    ps["params"]["lora_b_v"] = jnp.asarray(
        rng.normal(size=(3, 16)).astype(np.float32))
    for name in ("a_q", "b_q", "a_v", "b_v"):
        src = ps["params"][f"lora_{name}"]
        pm["params"][f"lora_moe_{name}"] = jnp.broadcast_to(
            src[None], (4, *src.shape))
    np.testing.assert_allclose(np.asarray(moe.apply(pm, x)),
                               np.asarray(single.apply(ps, x)),
                               rtol=1e-5, atol=1e-6)
