"""TITAN released-checkpoint interop drill (VERDICT r3 missing #3).

The published ``MahmoodLab/TITAN`` encoder is HF ``trust_remote_code``
(``/root/reference/models/model_titan.py:20``): its param schema lives in
Python files fetched from the Hub at load time, which the reference does not
vendor and this zero-egress environment cannot fetch (MIGRATING.md records
the DNS-failure evidence). What IS pinned offline by the reference source is
the *wrapper-level* checkpoint layout — ``titan.*`` opaque encoder subtree +
``mlp.weight [C, 768]`` / ``mlp.bias [C]`` linear probe (init normal(0.01)/
zeros, ``model_titan.py:22-24``) under the eval-harness cleaning semantics
(``eval_utils.py:49-57``). This file drills exactly that boundary in the
style of ``tests/test_fullshape_ckpt.py``: fabricate a release-scale wrapper
checkpoint, convert what is knowable, and fail LOUDLY on what is not.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moc_tpu.models.titan import (TitanConfig, TitanEncoderUnavailable,
                                  TitanHead, convert_titan_probe,
                                  load_titan_probe_checkpoint,
                                  titan_encoder_keys)

torch = pytest.importorskip("torch")

N_CLASSES = 2


def _fabricated_wrapper_state():
    """A release-scale reference ``TITAN`` wrapper state dict: the probe at
    its pinned shapes/init plus a stand-in opaque encoder subtree (the real
    key names are unknowable offline — the drill only asserts they are
    detected and refused, never mapped). Includes an ``instance_loss_fn``
    buffer the reference cleaner must drop (``eval_utils.py:53``)."""
    torch.manual_seed(0)
    mlp = torch.nn.Linear(768, N_CLASSES)
    mlp.weight.data.normal_(mean=0.0, std=0.01)  # model_titan.py:23
    mlp.bias.data.zero_()                        # model_titan.py:24
    sd = {
        "mlp.weight": mlp.weight.detach().clone(),
        "mlp.bias": mlp.bias.detach().clone(),
        # opaque remote-code subtree (names fabricated on purpose)
        "titan.vision_encoder.blocks.0.attn.qkv.weight": torch.randn(2304, 768),
        "titan.vision_encoder.cls_token": torch.randn(1, 1, 768),
        "titan.logit_scale": torch.tensor(4.6052),
        # reference cleaning must drop this (eval_utils.py:53)
        "instance_loss_fn.buffer": torch.zeros(1),
    }
    return sd, mlp


def test_probe_conversion_matches_torch_linear():
    """The converted probe computes bit-for-bit what the reference's ``mlp``
    computes — both on slide embeddings (``forward``) and raw patch features
    (``forward_patch_level`` applies ``mlp`` straight to feats,
    ``model_titan.py:52-57``)."""
    sd, mlp = _fabricated_wrapper_state()
    params = convert_titan_probe(sd, N_CLASSES)
    kernel = params["head"]["kernel"]
    bias = params["head"]["bias"]
    assert kernel.shape == (768, N_CLASSES) and bias.shape == (N_CLASSES,)

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(64, 768)).astype(np.float32)
    with torch.no_grad():
        ref = mlp(torch.tensor(feats)).numpy()
    ours = feats @ kernel + bias
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_encoder_subtree_detected_and_refused(tmp_path):
    """A checkpoint carrying ``titan.*`` weights must be refused by default
    with guidance, never silently stripped to the probe."""
    sd, _ = _fabricated_wrapper_state()
    path = str(tmp_path / "titan_wrapper.pt")
    torch.save(sd, path)

    enc = titan_encoder_keys(sd)
    assert len(enc) == 3 and all(k.startswith("titan.") for k in enc)

    with pytest.raises(TitanEncoderUnavailable, match="remote code"):
        load_titan_probe_checkpoint(path, N_CLASSES)

    params = load_titan_probe_checkpoint(path, N_CLASSES,
                                         allow_encoder_drop=True)
    np.testing.assert_array_equal(params["head"]["bias"], np.zeros(N_CLASSES))


def test_probe_shape_contract_enforced():
    """Wrong probe shapes (not ``[C, 768]``) fail loudly — the drill that
    caught real converter bugs for CONCH/MUSK applies the same pinned-shape
    discipline here."""
    sd, _ = _fabricated_wrapper_state()
    sd["mlp.weight"] = torch.randn(N_CLASSES, 512)  # not a TITAN embedding
    with pytest.raises(ValueError, match=r"\[2, 768\]"):
        convert_titan_probe(sd, N_CLASSES)
    with pytest.raises(ValueError):
        convert_titan_probe(_fabricated_wrapper_state()[0], n_classes=5)


def test_probe_loads_onto_native_head():
    """The converted probe merges onto ``TitanHead`` (at the TITAN embedding
    width) and the forward consumes it: logits == slide_emb @ W.T + b with
    the reference's probe weights."""
    cfg = TitanConfig(n_classes=N_CLASSES, in_dim=768, dim=768, num_layers=1,
                      num_heads=8)
    head = TitanHead(cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(32, 768)).astype(np.float32))
    coords = jnp.asarray((rng.integers(0, 40, size=(32, 2)) * 512).astype(np.int32))
    valid = jnp.ones((32,), bool)
    params = head.init(jax.random.PRNGKey(0), feats, coords, valid)

    sd, mlp = _fabricated_wrapper_state()
    probe = convert_titan_probe(sd, N_CLASSES)
    import flax

    merged = flax.core.unfreeze(params)
    merged["params"]["head"] = {"kernel": jnp.asarray(probe["head"]["kernel"]),
                                "bias": jnp.asarray(probe["head"]["bias"])}

    out = head.apply(merged, feats, coords, valid)
    with torch.no_grad():
        expect = mlp(torch.tensor(np.asarray(out["slide_embedding"]))[None]).numpy()[0]
    np.testing.assert_allclose(np.asarray(out["logits"]), expect,
                               rtol=1e-5, atol=1e-5)
