"""End-to-end MUSK/BEiT3 converter parity against the REFERENCE torch model.

The reference torchscale stack imports ``fairscale`` (checkpoint/FSDP
wrappers, used only when ``checkpoint_activations``/``fsdp`` are on —
``architecture/encoder.py:9,293-306``) and ``timm`` (``drop_path`` /
``trunc_normal_`` / ``register_model`` — ``component/droppath.py:5``,
``modeling.py:13-17``), neither installed here. Both are inert for an
eval-mode CPU forward, so this module installs minimal stand-ins into
``sys.modules`` before importing the reference — which turns the previously
structural-only converter tests into true numerical parity tests:

    random-init torch MUSK → state_dict → convert_musk_checkpoint →
    flax MUSK forward == torch forward (vision / text / mixed paths).

Skipped when ``/root/reference`` or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models", "musk"))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference MUSK unavailable")


def _install_stubs():
    """fairscale/timm stand-ins: only symbols the reference imports at module
    scope, behavior-faithful for eval-mode forwards (drop_path is identity at
    p=0; checkpoint_wrapper/wrap are only reached when activations
    checkpointing / FSDP are enabled, which our configs keep off)."""
    if "fairscale" not in sys.modules:
        fs = types.ModuleType("fairscale")
        fsnn = types.ModuleType("fairscale.nn")
        fsnn.checkpoint_wrapper = lambda m, *a, **k: m
        fsnn.wrap = lambda m, *a, **k: m
        fs.nn = fsnn
        sys.modules["fairscale"] = fs
        sys.modules["fairscale.nn"] = fsnn
        from tests._stub_spec import ensure_spec

        ensure_spec("fairscale", "fairscale.nn")
    # EXTEND any existing timm stub (test_vila_oracle installs one without
    # drop_path; module execution order must not matter)
    if True:
        def drop_path(x, drop_prob=0.0, training=False):
            if drop_prob == 0.0 or not training:
                return x
            keep = 1.0 - drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

        def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                t.normal_(mean, std).clamp_(min(a, a * std), max(b, b * std))
            return t

        tm = sys.modules.setdefault("timm", types.ModuleType("timm"))
        tmm = getattr(tm, "models", None) or types.ModuleType("timm.models")
        tml = getattr(tmm, "layers", None) or types.ModuleType("timm.models.layers")
        tmr = getattr(tmm, "registry", None) or types.ModuleType("timm.models.registry")
        if not hasattr(tml, "drop_path"):
            tml.drop_path = drop_path
        if not hasattr(tml, "trunc_normal_"):
            tml.trunc_normal_ = trunc_normal_
        if not hasattr(tmr, "register_model"):
            tmr.register_model = lambda fn: fn
        tm.models = tmm
        tmm.layers = tml
        tmm.registry = tmr
        for k, v in (("timm", tm), ("timm.models", tmm),
                     ("timm.models.layers", tml), ("timm.models.registry", tmr)):
            # a bare ModuleType has __spec__ None, which breaks OTHER
            # packages' importlib.util.find_spec probes later in the same
            # pytest process (transformers' lazy loader raised
            # "timm.__spec__ is None") — give every stub a real spec
            if getattr(v, "__spec__", None) is None:
                import importlib.machinery

                v.__spec__ = importlib.machinery.ModuleSpec(k, None)
            sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_musk():
    """Small random-init reference MUSK (eval mode) + matching flax config."""
    _install_stubs()
    path = os.path.join(REFERENCE, "models")
    if path not in sys.path:
        sys.path.insert(0, path)
    from musk.modeling import MUSK as TorchMUSK  # noqa: E501  (reference import)
    from musk.torchscale.architecture.config import EncoderConfig as TorchCfg

    torch.manual_seed(0)
    tcfg = TorchCfg(
        img_size=32, patch_size=16, vocab_size=120,
        encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_layers=2, encoder_attention_heads=4,
        multiway=True, layernorm_embedding=False, normalize_output=True,
        no_output_layer=True, drop_path_rate=0.0,
        checkpoint_activations=False, flash_attention=False,
        max_source_positions=64,
    )
    model = TorchMUSK(tcfg).eval()

    from moc_tpu.models.musk import MuskConfig
    from moc_tpu.nn.encoder import EncoderConfig

    jcfg = MuskConfig(
        image_size=32, patch_size=16, vocab_size=120, max_text_len=62,
        embed_dim=64, out_dim=64,
        encoder=EncoderConfig(embed_dim=64, ffn_dim=128, layers=2, heads=4,
                              multiway=True, subln=True),
    )
    return model, jcfg


@pytest.fixture(scope="module")
def converted(ref_musk):
    from moc_tpu.models.musk import MUSK
    from moc_tpu.zeroshot.convert_musk import convert_musk_checkpoint

    tmodel, jcfg = ref_musk
    variables = convert_musk_checkpoint(tmodel.state_dict())
    return MUSK(jcfg), variables


def test_state_dict_fully_consumed_tree_matches_init(ref_musk, converted):
    """Converted tree has exactly the structure the flax model initializes."""
    import jax
    import jax.numpy as jnp

    tmodel, jcfg = ref_musk
    model, variables = converted
    init = model.init(jax.random.PRNGKey(0),
                      images=jnp.zeros((1, 32, 32, 3)),
                      token_ids=jnp.zeros((1, 8), jnp.int32))
    flat_init = {"/".join(map(str, k)): v.shape
                 for k, v in jax.tree_util.tree_leaves_with_path(init)
                 for k in [jax.tree_util.keystr(k, simple=True, separator="/").split("/")]}
    flat_conv = {"/".join(map(str, k)): v.shape
                 for k, v in jax.tree_util.tree_leaves_with_path(variables)
                 for k in [jax.tree_util.keystr(k, simple=True, separator="/").split("/")]}
    assert flat_init == flat_conv


def test_vision_text_head_parity(ref_musk, converted):
    """with_head + out_norm vision/text embeddings match the torch oracle."""
    tmodel, _ = ref_musk
    model, variables = converted

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    toks = rng.integers(0, 120, size=(2, 10))
    pad = np.zeros((2, 10), bool)
    pad[0, 7:] = True  # ragged text lengths exercise the padding mask

    with torch.no_grad():
        tv, tt = tmodel(image=torch.from_numpy(img),
                        text_description=torch.from_numpy(toks),
                        padding_mask=torch.from_numpy(pad),
                        return_global=True, with_head=True, out_norm=True)

    jv, jt, scale = model.apply(
        variables, images=np.transpose(img, (0, 2, 3, 1)),
        token_ids=toks, text_padding_mask=pad, normalize=True)

    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=2e-5, rtol=1e-4)
    assert np.isclose(float(scale), float(tmodel.logit_scale.detach().exp()))


def test_mixed_modality_encoder_parity(ref_musk, converted):
    """Joint [vision; text] forward: multiway split + padding concat
    (``BEiT3.py:67-83``) match in raw encoder-output space."""
    tmodel, _ = ref_musk
    model, variables = converted

    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    toks = rng.integers(0, 120, size=(2, 6))
    pad = np.zeros((2, 6), bool)
    pad[1, 4:] = True

    with torch.no_grad():
        out = tmodel.beit3(visual_tokens=torch.from_numpy(img),
                           textual_tokens=torch.from_numpy(toks),
                           text_padding_position=torch.from_numpy(pad))
    t_out = out["encoder_out"].numpy()

    j_out, _ = model.apply(
        variables, method=lambda m, **kw: m.beit3(**kw),
        visual_tokens=np.transpose(img, (0, 2, 3, 1)),
        textual_tokens=toks, text_padding_mask=pad)
    j = np.asarray(j_out)

    # padded text rows are masked out of attention in both models but the
    # residual stream values at pad positions are unspecified — compare
    # valid positions only
    valid = np.concatenate([np.ones((2, t_out.shape[1] - 6), bool), ~pad], axis=1)
    np.testing.assert_allclose(j[valid], t_out[valid], atol=2e-5, rtol=1e-4)


def test_vision_only_uses_branch_a(ref_musk, converted):
    """Vision-only forward (multiway_split_position=-1) parity, raw cls."""
    tmodel, _ = ref_musk
    model, variables = converted

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tv, _ = tmodel(image=torch.from_numpy(img), with_head=False, out_norm=False)
    jv_out, _ = model.apply(variables, method=lambda m, **kw: m.beit3(**kw),
                            visual_tokens=np.transpose(img, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jv_out)[:, 0], tv.numpy(),
                               atol=2e-5, rtol=1e-4)
