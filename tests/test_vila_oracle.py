"""ViLa-MIL parity against the reference torch model.

Instantiates the reference ``ViLa_MIL_Model`` (``models/model_ViLa_MIL.py``)
around a random-init CONCH text tower (the real tokenizer from the vendored
assets, a small ``TextTransformer`` standing in for the checkpoint-loaded
CONCH — ``load_conch_to_cpu`` is patched, as is the forward's hard-coded
``.cuda()``), and compares the flax ``ViLaMIL`` on re-laid weights.
Skipped without ``/root/reference``.
"""

import os
import sys

from tests._stub_spec import ensure_spec
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models"))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")

C = 2          # classes (prompts = 2C: low then high scale)
D = 24         # input_size / text output dim
W = 32         # text tower width
PROTO = 5


def _install_conch_stubs():
    """The conch package __init__ imports timm's VisionTransformer and
    huggingface_hub at module scope; neither is touched by the text-only
    path ViLa uses."""
    import importlib.machinery

    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    tm = sys.modules["timm"]
    if getattr(tm, "__spec__", None) is None:
        # transformers probes importlib.util.find_spec("timm"), which raises
        # on spec-less stub modules
        tm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
    if not hasattr(tm, "models"):
        tm.models = types.ModuleType("timm.models")
        sys.modules["timm.models"] = tm.models
    tmm = tm.models
    if not hasattr(tmm, "vision_transformer"):
        tmm.vision_transformer = types.ModuleType(
            "timm.models.vision_transformer")
        sys.modules["timm.models.vision_transformer"] = tmm.vision_transformer
    if not hasattr(tmm.vision_transformer, "VisionTransformer"):
        class VisionTransformer(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        tmm.vision_transformer.VisionTransformer = VisionTransformer
    if not hasattr(tmm, "layers"):
        tmm.layers = types.ModuleType("timm.models.layers")
        sys.modules["timm.models.layers"] = tmm.layers
        ensure_spec("timm", "timm.models", "timm.models.vision_transformer", "timm.models.layers")
    # other oracle suites (test_musk_oracle) may have installed a partial
    # timm.models.layers already — extend, never assume
    tl = tmm.layers
    if not hasattr(tl, "Mlp"):
        tl.Mlp = torch.nn.Identity
    if not hasattr(tl, "to_2tuple"):
        tl.to_2tuple = lambda x: (x, x) if not isinstance(x, tuple) else x
    if not hasattr(tl, "trunc_normal_"):
        tl.trunc_normal_ = lambda t, *a, **k: t
    # conch utils.py / transform.py want torchvision pieces; extend whatever
    # torchvision stub other oracle tests may have installed in this session
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if getattr(tv, "__spec__", None) is None:
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tr = sys.modules.setdefault("torchvision.transforms",
                                getattr(tv, "transforms",
                                        types.ModuleType("torchvision.transforms")))
    tv.transforms = tr
    for name in ("Normalize", "Compose", "RandomResizedCrop", "ToTensor",
                 "Resize", "CenterCrop"):
        if not hasattr(tr, name):
            setattr(tr, name, type(name, (), {"__init__":
                                              lambda self, *a, **k: None}))
    if not hasattr(tr, "InterpolationMode"):
        tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic",
                                                     BILINEAR="bilinear")
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.FrozenBatchNorm2d = torch.nn.Identity
    ops.misc = misc
    tv.ops = ops
    sys.modules.setdefault("torchvision.ops", ops)
    sys.modules.setdefault("torchvision.ops.misc", misc)


@pytest.fixture(scope="module")
def ref_vila():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _install_conch_stubs()
    from models import model_ViLa_MIL as mv
    from models.conch.open_clip_custom.transformer import TextTransformer

    torch.manual_seed(0)
    text = TextTransformer(context_length=128, vocab_size=32007, width=W,
                           heads=4, layers=2, output_dim=D, embed_cls=True,
                           output_tokens=False).eval()
    fake_conch = types.SimpleNamespace(text=text)
    mv.load_conch_to_cpu = lambda *a, **k: fake_conch

    # the reference forward calls .cuda() on the text features
    real_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    cfg = types.SimpleNamespace(
        input_size=D, hidden_size=16, prototype_number=PROTO,
        text_prompt=["an image of lung adenocarcinoma tissue",
                     "an image of lung squamous cell carcinoma tissue",
                     "a high resolution image of lung adenocarcinoma",
                     "a high resolution image of lung squamous carcinoma"])
    torch.manual_seed(1)
    model = mv.ViLa_MIL_Model(cfg, num_classes=C).eval()
    yield model, text
    torch.Tensor.cuda = real_cuda


def _np(t):
    return t.detach().numpy()


def _dense(sd, p):
    return {"kernel": _np(sd[f"{p}.weight"]).T, "bias": _np(sd[f"{p}.bias"])}


def _mha(sd, p, d):
    w = _np(sd[f"{p}.in_proj_weight"])
    b = _np(sd[f"{p}.in_proj_bias"])
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": _dense(sd, f"{p}.out_proj"),
    }


def _convert(model, text):
    from moc_tpu.zeroshot.convert import convert_text_tower

    sd = {k: v for k, v in model.state_dict().items()}
    tsd = {f"text.{k}": v for k, v in text.state_dict().items()}
    tt = convert_text_tower(tsd, "text")
    ln = lambda p: {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}
    return {"params": {
        "ctx": _np(sd["prompt_learner.ctx"]),
        "text_encoder": {
            "positional_embedding": tt["positional_embedding"],
            "transformer": tt["transformer"],
            "ln_final": tt["ln_final"],
            "text_projection": tt["text_projection"],
        },
        "cross_attention_1": _mha(sd, "cross_attention_1", D),
        "cross_attention_2": _mha(sd, "cross_attention_2", D),
        "norm": ln("norm"),
        "attention_V": _dense(sd, "attention_V.0"),
        "attention_U": _dense(sd, "attention_U.0"),
        "attention_weights": _dense(sd, "attention_weights"),
        "learnable_image_center": _np(sd["learnable_image_center"])[:, 0, :],
    }}


def test_vila_forward_parity(ref_vila):
    import jax.numpy as jnp

    from moc_tpu.models.vila import PromptConstants, VilaConfig, ViLaMIL
    from moc_tpu.zeroshot.text_tower import TextConfig

    model, text = ref_vila
    pl = model.prompt_learner
    prompts = PromptConstants(
        token_prefix=_np(pl.token_prefix),
        token_suffix=_np(pl.token_suffix),
        eot_idx=_np(pl.tokenized_prompts.argmax(dim=-1)),
    )
    rng = np.random.default_rng(3)
    x_s = rng.normal(size=(30, D)).astype(np.float32)
    x_l = rng.normal(size=(18, D)).astype(np.float32)
    label = 1
    with torch.no_grad():
        y_prob, y_hat, loss = model(torch.from_numpy(x_s),
                                    torch.from_numpy(x_l),
                                    torch.tensor([label]))

    jcfg = VilaConfig(n_classes=C, input_size=D, hidden_size=16,
                      prototype_number=PROTO,
                      text=TextConfig(context_length=128, vocab_size=32007,
                                      width=W, heads=4, layers=2,
                                      output_dim=D))
    out = ViLaMIL(jcfg).apply(
        _convert(model, text), jnp.asarray(x_s), jnp.ones(30, bool),
        jnp.asarray(x_l), jnp.ones(18, bool), prompts)
    got_prob = np.asarray(jax_softmax(out["logits"]))
    np.testing.assert_allclose(got_prob, y_prob.numpy()[0], rtol=2e-4,
                               atol=2e-5)
    import optax

    got_loss = optax.softmax_cross_entropy_with_integer_labels(
        out["logits"][None], jnp.asarray([label]))[0]
    np.testing.assert_allclose(float(got_loss), float(loss), rtol=2e-4)


def test_vila_padding_invariance_matches_unpadded(ref_vila):
    """Padded bags with junk rows produce the same logits the reference
    computes on the unpadded bags."""
    import jax.numpy as jnp

    from moc_tpu.models.vila import PromptConstants, VilaConfig, ViLaMIL
    from moc_tpu.zeroshot.text_tower import TextConfig

    model, text = ref_vila
    pl = model.prompt_learner
    prompts = PromptConstants(
        token_prefix=_np(pl.token_prefix),
        token_suffix=_np(pl.token_suffix),
        eot_idx=_np(pl.tokenized_prompts.argmax(dim=-1)),
    )
    rng = np.random.default_rng(4)
    x_s = rng.normal(size=(11, D)).astype(np.float32)
    x_l = rng.normal(size=(7, D)).astype(np.float32)
    with torch.no_grad():
        y_prob, _, _ = model(torch.from_numpy(x_s), torch.from_numpy(x_l),
                             torch.tensor([0]))
    pad = lambda x, n: np.concatenate(
        [x, np.full((n - len(x), D), 7.7, np.float32)])
    mask = lambda k, n: np.arange(n) < k
    jcfg = VilaConfig(n_classes=C, input_size=D, hidden_size=16,
                      prototype_number=PROTO,
                      text=TextConfig(context_length=128, vocab_size=32007,
                                      width=W, heads=4, layers=2,
                                      output_dim=D))
    out = ViLaMIL(jcfg).apply(
        _convert(model, text), jnp.asarray(pad(x_s, 16)),
        jnp.asarray(mask(11, 16)), jnp.asarray(pad(x_l, 12)),
        jnp.asarray(mask(7, 12)), prompts)
    got_prob = np.asarray(jax_softmax(out["logits"]))
    np.testing.assert_allclose(got_prob, y_prob.numpy()[0], rtol=2e-4,
                               atol=2e-5)


def jax_softmax(x):
    import jax

    return jax.nn.softmax(x)
