"""Encoder feature parity against the reference torchscale Encoder.

The MUSK oracle (``test_musk_oracle``) covers the multiway+subln
configuration; this module drives the remaining encoder features the
reference supports — xPos rotary, T5 relative-position bias, deepnorm
post-LN α-residuals — through random-init torch Encoders and compares the
flax ``moc_tpu.nn.Encoder`` on re-laid weights. Skipped without
``/root/reference``.
"""

import os
import sys

import numpy as np
import pytest

from tests.test_musk_oracle import HAS_REFERENCE, REFERENCE, _install_stubs

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")

B, L, D, F, H, LAYERS = 2, 16, 32, 64, 4, 2


def _torch_encoder(**over):
    _install_stubs()
    path = os.path.join(REFERENCE, "models", "musk")
    if path not in sys.path:
        sys.path.insert(0, path)
    from torchscale.architecture.config import EncoderConfig as TorchCfg
    from torchscale.architecture.encoder import Encoder as TorchEnc

    torch.manual_seed(0)
    kw = dict(encoder_embed_dim=D, encoder_ffn_embed_dim=F,
              encoder_layers=LAYERS, encoder_attention_heads=H,
              vocab_size=-1, no_output_layer=True, multiway=False,
              dropout=0.0, drop_path_rate=0.0,
              checkpoint_activations=False, flash_attention=False)
    kw.update(over)
    tcfg = TorchCfg(**kw)
    return TorchEnc(tcfg, embed_tokens=None, embed_positions=None,
                    output_projection=None, is_encoder_decoder=False).eval()


def _jax_cfg(**over):
    from moc_tpu.nn.encoder import EncoderConfig

    kw = dict(embed_dim=D, ffn_dim=F, layers=LAYERS, heads=H,
              multiway=False, subln=True)
    kw.update(over)
    return EncoderConfig(**kw)


def _convert(tenc, subln=True, normalize_before=True):
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    dense = lambda p: {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}
    ln = lambda p: {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}
    params = {}
    for i in range(LAYERS):
        p = f"layers.{i}"
        attn = {name: dense(f"{p}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")}
        if subln:
            attn["inner_attn_ln"] = ln(f"{p}.self_attn.inner_attn_ln")
        ffn = {"fc1": dense(f"{p}.ffn.fc1"), "fc2": dense(f"{p}.ffn.fc2")}
        if subln:
            ffn["ffn_layernorm"] = ln(f"{p}.ffn.ffn_layernorm")
        params[f"layers_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": {"A": ln(f"{p}.self_attn_layer_norm")},
            "final_layer_norm": {"A": ln(f"{p}.final_layer_norm")},
            "ffn": {"A": ffn},
        }
    if normalize_before and "layer_norm.weight" in sd:
        params["layer_norm"] = {"A": ln("layer_norm")}
    if "relative_position.relative_attention_bias.weight" in sd:
        params["relative_position"] = {
            "rel_attn_bias": sd["relative_position.relative_attention_bias.weight"]}
    return {"params": params}


def _compare(tenc, jcfg, *, pad=None, atol=3e-5, convert_kw=None):
    from moc_tpu.nn.encoder import Encoder

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    tpad = (torch.from_numpy(pad) if pad is not None else None)
    with torch.no_grad():
        ref = tenc(src_tokens=None, token_embeddings=torch.from_numpy(x),
                   encoder_padding_mask=tpad)["encoder_out"].numpy()
    model = Encoder(jcfg)
    out, _ = model.apply(_convert(tenc, **(convert_kw or {})), x,
                         padding_mask=pad)
    j = np.asarray(out)
    valid = (~pad if pad is not None else np.ones((B, L), bool))
    np.testing.assert_allclose(j[valid], ref[valid], atol=atol, rtol=1e-4)


def test_plain_subln_encoder_parity():
    _compare(_torch_encoder(), _jax_cfg())


def test_plain_encoder_padding_parity():
    pad = np.zeros((B, L), bool)
    pad[0, 11:] = True
    pad[1, 7:] = True
    _compare(_torch_encoder(), _jax_cfg(), pad=pad)


def test_xpos_encoder_parity():
    _compare(_torch_encoder(xpos_rel_pos=True, xpos_scale_base=512),
             _jax_cfg(xpos=True, xpos_scale_base=512))


def test_relative_position_bias_parity():
    _compare(_torch_encoder(rel_pos_buckets=32, max_rel_pos=128),
             _jax_cfg(rel_pos_buckets=32, max_rel_pos=128))


def test_deepnorm_encoder_parity():
    tenc = _torch_encoder(deepnorm=True)
    _compare(tenc, _jax_cfg(deepnorm=True),
             convert_kw={"subln": False, "normalize_before": False})
