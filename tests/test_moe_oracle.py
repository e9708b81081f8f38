"""MoE gate parity against the reference torchscale routing functions.

``top1gating``/``top2gating`` (``xmoe/routing.py``) are pure functions of the
gate logits, so they serve as exact oracles for ``moc_tpu.parallel.moe``:
same combine weights ``[S, E, C]``, dispatch mask, and aux loss — including
the subtle bits (second choices queue behind ALL first choices, gate-weight
renormalization after capacity dropping, padding-mask handling, capacity
formulas). Skipped without ``/root/reference``.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models", "musk"))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")


@pytest.fixture(scope="module")
def routing():
    path = os.path.join(REFERENCE, "models", "musk")
    if path not in sys.path:
        sys.path.insert(0, path)
    from torchscale.component.xmoe import routing as r

    # torch.histc has no CPU kernel for integer dtypes; it only feeds the
    # oracle's logging metadata, never the routing outputs
    real_histc = torch.histc
    torch.histc = lambda t, *a, **k: real_histc(t.float(), *a, **k)
    yield r
    torch.histc = real_histc


def _logits(s=50, e=8, seed=0):
    return np.random.default_rng(seed).normal(size=(s, e)).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cf", [1.0, 2.0])
def test_top1_gate_parity(routing, seed, cf):
    from moc_tpu.parallel.moe import capacity_for, top1_gate

    logits = _logits(seed=seed)
    s, e = logits.shape
    l_aux, combine, dispatch, _ = routing.top1gating(
        torch.from_numpy(logits), capacity_factor=cf)
    cap = capacity_for(s, e, "top1", cf)
    assert combine.shape[-1] == cap  # same capacity formula
    jc, jd, jaux = top1_gate(logits, cap)
    np.testing.assert_allclose(np.asarray(jc), combine.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(jd), dispatch.numpy())
    np.testing.assert_allclose(float(jaux), float(l_aux), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("normalize_before", [False, True])
def test_top2_gate_parity(routing, seed, normalize_before):
    from moc_tpu.parallel.moe import capacity_for, top2_gate

    logits = _logits(s=37, e=4, seed=seed)  # S/E > capacity → real drops
    s, e = logits.shape
    l_aux, combine, dispatch, _ = routing.top2gating(
        torch.from_numpy(logits), second_expert_policy="all",
        normalize_gate_prob_before_dropping=normalize_before)
    cap = capacity_for(s, e, "top2")
    assert combine.shape[-1] == cap
    jc, jd, jaux = top2_gate(logits, cap, normalize_before_drop=normalize_before)
    np.testing.assert_allclose(np.asarray(jc), combine.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(jd), dispatch.numpy())
    np.testing.assert_allclose(float(jaux), float(l_aux), rtol=1e-5)


def test_top1_gate_padding_parity(routing):
    from moc_tpu.parallel.moe import capacity_for, top1_gate

    logits = _logits(s=24, e=4, seed=3)
    pad = np.zeros(24, bool)
    pad[17:] = True
    l_aux, combine, dispatch, _ = routing.top1gating(
        torch.from_numpy(logits), input_mask=torch.from_numpy(pad))
    cap = capacity_for(24, 4, "top1")
    jc, jd, jaux = top1_gate(logits, cap, input_mask=pad)
    np.testing.assert_allclose(np.asarray(jc), combine.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(jd), dispatch.numpy())
    np.testing.assert_allclose(float(jaux), float(l_aux), rtol=1e-5)
    # padded tokens route nowhere
    assert not np.asarray(jd)[17:].any()


def test_top2_gate_padding_parity(routing):
    from moc_tpu.parallel.moe import capacity_for, top2_gate

    logits = _logits(s=24, e=4, seed=4)
    pad = np.zeros(24, bool)
    pad[20:] = True
    l_aux, combine, dispatch, _ = routing.top2gating(
        torch.from_numpy(logits), input_mask=torch.from_numpy(pad),
        second_expert_policy="all")
    cap = capacity_for(24, 4, "top2")
    jc, jd, jaux = top2_gate(logits, cap, input_mask=pad)
    np.testing.assert_allclose(np.asarray(jc), combine.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(jd), dispatch.numpy())
    np.testing.assert_allclose(float(jaux), float(l_aux), rtol=1e-5)


def test_eval_capacity_fraction(routing):
    from moc_tpu.parallel.moe import capacity_for

    logits = _logits(s=40, e=8, seed=5)
    _, combine, _, _ = routing.top1gating(
        torch.from_numpy(logits), eval_mode=True,
        moe_eval_capacity_token_fraction=0.25)
    assert combine.shape[-1] == capacity_for(40, 8, "top1",
                                             eval_capacity_fraction=0.25,
                                             is_eval=True)


# ───────────────────────── full MOELayer oracle ─────────────────────────
#
# The reference MOELayer cannot even construct without an initialized
# process group (``get_moe_group`` returns None otherwise,
# ``global_groups.py:11-33``); a single-process gloo world exercises the
# full dispatch → experts → combine path with identity collectives.


@pytest.fixture(scope="module")
def torch_moe_mod(routing):
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method=f"file:///tmp/moc_moe_pg_{os.getpid()}",
            rank=0, world_size=1)
    from torchscale.component import feedforward_network as ffn_mod
    from torchscale.component.xmoe import moe_layer as ml

    return ml, ffn_mod


def _build_torch_moe(torch_moe_mod, gate_type, e, cf, subln, d, f, seed=0):
    ml, ffn_mod = torch_moe_mod
    from torchscale.architecture.config import EncoderConfig as TorchCfg
    from torchscale.component.xmoe.routing import Top1Gate, Top2Gate

    torch.manual_seed(seed)
    args = TorchCfg(encoder_embed_dim=d, encoder_ffn_embed_dim=f,
                    moe_expert_count=e, dropout=0.0, activation_dropout=0.0,
                    subln=subln)
    args.batch_size = args.batch_size_valid = 0
    if gate_type == "top1":
        gate = Top1Gate(d, e, use_fp32=False, capacity_factor=cf)
    else:
        gate = Top2Gate(d, e, use_fp32=False, second_expert_policy="all",
                        normalize_gate_prob_before_dropping=False)
    experts = ffn_mod.make_experts(args, d, f)
    layer = ml.MOELayer(gate, experts, args).train()
    return layer


def _convert_moe(layer, subln):
    experts = list(layer.experts)
    st = lambda f: np.stack([f(x).detach().numpy() for x in experts])
    params = {
        "gate": {"kernel": layer.gate.wg.weight.detach().numpy().T},
        "experts_w1": st(lambda x: x.fc1.weight.T),
        "experts_b1": st(lambda x: x.fc1.bias),
        "experts_w2": st(lambda x: x.fc2.weight.T),
        "experts_b2": st(lambda x: x.fc2.bias),
    }
    if subln:
        params["experts_ln_scale"] = st(lambda x: x.ffn_layernorm.weight)
        params["experts_ln_bias"] = st(lambda x: x.ffn_layernorm.bias)
    return {"params": params}


@pytest.mark.parametrize("gate_type", ["top1", "top2"])
@pytest.mark.parametrize("subln", [True, False])
def test_moe_layer_full_parity(torch_moe_mod, gate_type, subln):
    from moc_tpu.parallel.moe import MoEConfig, MoELayer

    b, t, d, f, e, cf = 2, 18, 16, 32, 4, 1.0
    layer = _build_torch_moe(torch_moe_mod, gate_type, e, cf, subln, d, f)
    x = np.random.default_rng(0).normal(size=(b, t, d)).astype(np.float32)
    with torch.no_grad():
        ref, l_aux = layer(torch.from_numpy(x))
    jlayer = MoELayer(dim=d, hidden_dim=f,
                      cfg=MoEConfig(n_experts=e, capacity_factor=cf,
                                    gate_type=gate_type, expert_subln=subln))
    y, aux = jlayer.apply(_convert_moe(layer, subln), x.reshape(b * t, d))
    np.testing.assert_allclose(np.asarray(y).reshape(b, t, d), ref.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux), float(l_aux), rtol=1e-4)


def test_eval_capacity_fraction_train_mode_ignored():
    """A config carrying eval_capacity_fraction must not change train-time
    capacity (the reference gates the fraction on eval_mode,
    routing.py:57-58,278-279)."""
    import jax.numpy as jnp
    import numpy as np

    from moc_tpu.parallel.moe import MoEConfig, capacity_for, moe_dispatch_combine

    assert capacity_for(40, 8, "top1", 1.0, eval_capacity_fraction=0.25,
                        is_eval=False) == capacity_for(40, 8, "top1", 1.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    gl = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    ident = lambda t: t
    train_cfg = MoEConfig(n_experts=4, gate_type="top1",
                          eval_capacity_fraction=0.99, is_eval=False)
    plain_cfg = MoEConfig(n_experts=4, gate_type="top1")
    y_train, _ = moe_dispatch_combine(x, gl, ident, train_cfg)
    y_plain, _ = moe_dispatch_combine(x, gl, ident, plain_cfg)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_plain))
    # eval mode with a generous fraction keeps MORE tokens than the tight cap
    eval_cfg = MoEConfig(n_experts=4, gate_type="top1",
                         eval_capacity_fraction=0.99, is_eval=True)
    y_eval, _ = moe_dispatch_combine(x, gl, ident, eval_cfg)
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_plain))
