"""RetNet parity against the reference torchscale RetNetDecoder.

Random-init the reference torch decoder (fairscale/timm stubbed — see
``test_musk_oracle``), re-lay its weights onto ``moc_tpu.nn.RetNetDecoder``,
and compare all three computation forms:

  * parallel  ↔ reference default forward;
  * recurrent ↔ reference incremental_state stepping;
  * chunkwise ↔ reference ``chunkwise_recurrent`` forward.

The reference's per-row stabilization scalings differ across forms but are
cancelled by the affine-free per-head RMSNorm, so all forms must agree with
each other AND with us. Skipped without ``/root/reference``.
"""

import os
import sys

import numpy as np
import pytest

from tests.test_musk_oracle import HAS_REFERENCE, REFERENCE, _install_stubs

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")

B, L, D, V, H, F, LAYERS = 2, 8, 32, 64, 4, 64, 2


@pytest.fixture(scope="module")
def ref_decoder():
    _install_stubs()
    path = os.path.join(REFERENCE, "models", "musk")
    if path not in sys.path:
        sys.path.insert(0, path)
    from torchscale.architecture.config import RetNetConfig as TorchCfg
    from torchscale.architecture.retnet import RetNetDecoder as TorchDec

    torch.manual_seed(0)
    tcfg = TorchCfg(
        decoder_embed_dim=D, decoder_value_embed_dim=V,
        decoder_retention_heads=H, decoder_ffn_embed_dim=F,
        decoder_layers=LAYERS, no_output_layer=True, vocab_size=-1,
        dropout=0.0, drop_path_rate=0.0, chunkwise_recurrent=False,
        recurrent_chunk_size=4, checkpoint_activations=False,
    )
    return TorchDec(tcfg).eval(), tcfg


def _convert(tdec):
    """torch RetNetDecoder state dict → flax RetNetDecoder params."""
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = {}
    i = 0
    while f"layers.{i}.retention.q_proj.weight" in sd:
        p = f"layers.{i}"
        params[f"layers_{i}"] = {
            "retention": {
                name: {"kernel": sd[f"{p}.retention.{name}.weight"].T}
                for name in ("q_proj", "k_proj", "v_proj", "g_proj", "out_proj")
            },
            "retention_layer_norm": {"scale": sd[f"{p}.retention_layer_norm.weight"]},
            "final_layer_norm": {"scale": sd[f"{p}.final_layer_norm.weight"]},
            "ffn": {name: {"kernel": sd[f"{p}.ffn.{name}.weight"].T}
                    for name in ("gate", "fc1", "fc2")},
        }
        i += 1
    params["layer_norm"] = {"scale": sd["layer_norm.weight"]}
    return {"params": params}


@pytest.fixture(scope="module")
def jax_decoder(ref_decoder):
    from moc_tpu.nn.retnet import RetNetConfig, RetNetDecoder

    tdec, _ = ref_decoder
    cfg = RetNetConfig(embed_dim=D, value_dim=V, heads=H, ffn_dim=F,
                       layers=LAYERS)
    return RetNetDecoder(cfg), _convert(tdec)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, L, D)).astype(np.float32)


def _ref_parallel(tdec, x):
    tokens = torch.zeros(B, L, dtype=torch.long)
    with torch.no_grad():
        out, _ = tdec(tokens, token_embeddings=torch.from_numpy(x),
                      features_only=True)
    return out.numpy()


def test_parallel_parity(ref_decoder, jax_decoder, inputs):
    tdec, _ = ref_decoder
    model, params = jax_decoder
    ref = _ref_parallel(tdec, inputs)
    out, _ = model.apply(params, inputs, mode="parallel")
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_recurrent_parity(ref_decoder, jax_decoder, inputs):
    """Step-by-step incremental decoding matches our scan over the sequence."""
    tdec, _ = ref_decoder
    model, params = jax_decoder

    inc = {}
    ref_steps = []
    with torch.no_grad():
        for t in range(L):
            tokens = torch.zeros(B, t + 1, dtype=torch.long)
            out, _ = tdec(tokens, incremental_state=inc,
                          token_embeddings=torch.from_numpy(inputs[:, t:t + 1]),
                          features_only=True)
            ref_steps.append(out.numpy()[:, 0])
    ref = np.stack(ref_steps, axis=1)  # [B, L, D]

    out, _ = model.apply(params, inputs, mode="recurrent")
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_chunkwise_parity(ref_decoder, jax_decoder, inputs):
    import dataclasses as dc

    _, tcfg = ref_decoder
    _install_stubs()
    from torchscale.architecture.retnet import RetNetDecoder as TorchDec

    # fresh decoder flagged chunkwise, same weights
    tdec_chunk = TorchDec(tcfg).eval()
    tdec_chunk.load_state_dict(ref_decoder[0].state_dict())
    tdec_chunk.chunkwise_recurrent = True

    model, params = jax_decoder
    tokens = torch.zeros(B, L, dtype=torch.long)
    with torch.no_grad():
        ref, _ = tdec_chunk(tokens, token_embeddings=torch.from_numpy(inputs),
                            features_only=True)
        ref_par, _ = ref_decoder[0](tokens,
                                    token_embeddings=torch.from_numpy(inputs),
                                    features_only=True)
    out, _ = model.apply(params, inputs, mode="chunkwise", chunk_size=4)
    # The reference's chunkwise stabilization scalings interact with the
    # RMSNorm eps, so its own chunkwise drifts ~5e-3 from its parallel form
    # (measured); ours is scale-clean and matches parallel to 2e-7. Parity
    # to the reference chunkwise is therefore bounded by that drift...
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-2, rtol=1e-2)
    # ...while parity to the exact (parallel) values stays tight.
    np.testing.assert_allclose(np.asarray(out), ref_par.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_forms_mutually_consistent(jax_decoder, inputs):
    model, params = jax_decoder
    par, _ = model.apply(params, inputs, mode="parallel")
    rec, _ = model.apply(params, inputs, mode="recurrent")
    np.testing.assert_allclose(np.asarray(par), np.asarray(rec),
                               atol=2e-5, rtol=1e-4)
