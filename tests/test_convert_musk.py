"""MUSK checkpoint converter: synthetic torchscale-layout state dict →
flax params that initialize and run the MUSK model, with spot-checked value
mappings (no runnable torchscale oracle exists in this environment —
fairscale is absent — so parity is structural)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from moc_tpu.models.musk import MUSK, MuskConfig
from moc_tpu.nn.encoder import EncoderConfig
from moc_tpu.zeroshot.convert_musk import convert_musk_checkpoint

CFG = MuskConfig(
    image_size=32, patch_size=16, vocab_size=120, max_text_len=12,
    embed_dim=64, out_dim=48,
    encoder=EncoderConfig(embed_dim=64, ffn_dim=128, layers=2, heads=4,
                          multiway=True, subln=True),
)


def _fake_state_dict(rng):
    d, f, v = 64, 128, 120
    n_vis = (32 // 16) ** 2 + 1  # patches + cls
    sd = {}

    def put(key, *shape):
        sd[key] = rng.normal(size=shape).astype(np.float32) * 0.05

    put("beit3.text_embed.weight", v, d)
    put("beit3.vision_embed.proj.weight", d, 3, 16, 16)
    put("beit3.vision_embed.proj.bias", d)
    put("beit3.vision_embed.cls_token", 1, 1, d)
    put("beit3.vision_embed.mask_token", 1, 1, d)
    put("beit3.encoder.embed_positions.A.weight", n_vis + 2, d)
    put("beit3.encoder.embed_positions.B.weight", 12 + 2, d)
    for i in range(2):
        p = f"beit3.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            for br in ("A", "B"):
                put(f"{p}.self_attn.{proj}.{br}.weight", d, d)
                put(f"{p}.self_attn.{proj}.{br}.bias", d)
        for br in ("A", "B"):
            put(f"{p}.self_attn.inner_attn_ln.{br}.weight", d)
            put(f"{p}.self_attn.inner_attn_ln.{br}.bias", d)
            put(f"{p}.self_attn_layer_norm.{br}.weight", d)
            put(f"{p}.self_attn_layer_norm.{br}.bias", d)
            put(f"{p}.final_layer_norm.{br}.weight", d)
            put(f"{p}.final_layer_norm.{br}.bias", d)
            put(f"{p}.ffn.{br}.fc1.weight", f, d)
            put(f"{p}.ffn.{br}.fc1.bias", f)
            put(f"{p}.ffn.{br}.fc2.weight", d, f)
            put(f"{p}.ffn.{br}.fc2.bias", d)
            put(f"{p}.ffn.{br}.ffn_layernorm.weight", f)
            put(f"{p}.ffn.{br}.ffn_layernorm.bias", f)
    for br in ("A", "B"):
        put(f"beit3.encoder.layer_norm.{br}.weight", d)
        put(f"beit3.encoder.layer_norm.{br}.bias", d)
    put("vision_head.weight", 48, d)
    put("language_head.weight", 48, d)
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)
    return sd


def test_convert_musk_structure_and_forward():
    rng = np.random.default_rng(0)
    sd = _fake_state_dict(rng)
    params = convert_musk_checkpoint(sd)

    # spot-check mappings
    np.testing.assert_allclose(
        params["params"]["beit3"]["text_embed"]["embedding"],
        sd["beit3.text_embed.weight"],
    )
    np.testing.assert_allclose(
        params["params"]["beit3"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["A"]["kernel"],
        sd["beit3.encoder.layers.0.self_attn.q_proj.A.weight"].T,
    )
    np.testing.assert_allclose(
        params["params"]["beit3"]["vision_pos"],
        sd["beit3.encoder.embed_positions.A.weight"][2:],
    )
    assert params["params"]["beit3"]["vision_embed"]["proj"]["kernel"].shape == (16, 16, 3, 64)

    # the converted tree must align with the model's own init tree
    model = MUSK(CFG)
    imgs = jnp.zeros((2, 32, 32, 3))
    ids = jnp.zeros((2, 12), jnp.int32)
    ref_params = model.init(jax.random.PRNGKey(0), imgs, ids)
    ref_shapes = jax.tree.map(jnp.shape, ref_params)
    got_shapes = jax.tree.map(np.shape, params)
    assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes), (
        "converted tree structure differs from model init"
    )
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref_shapes, got_shapes))

    # and it must actually run
    v, t, scale = model.apply(params, imgs, ids)
    assert v.shape == (2, 48) and t.shape == (2, 48)
    assert np.all(np.isfinite(np.asarray(v))) and np.all(np.isfinite(np.asarray(t)))
    assert float(scale) > 14.0  # exp(log 1/0.07)


def test_vision_pos_interpolation_matches_torch_bicubic():
    import torch
    import torch.nn.functional as F

    from moc_tpu.zeroshot.convert_musk import interpolate_vision_pos

    rng = np.random.default_rng(0)
    for og, ng in ((14, 24), (24, 14)):
        d = 32
        pos = rng.normal(size=(1 + og * og, d)).astype(np.float32)
        ours = interpolate_vision_pos(pos, ng * ng)
        assert ours.shape == (1 + ng * ng, d)
        np.testing.assert_array_equal(ours[0], pos[0])  # cls row untouched
        pt = torch.from_numpy(pos[1:]).reshape(1, og, og, d).permute(0, 3, 1, 2)
        pt = F.interpolate(pt.float(), size=(ng, ng), mode="bicubic",
                           align_corners=False)
        ref = pt.permute(0, 2, 3, 1).reshape(ng * ng, d).numpy()
        np.testing.assert_allclose(ours[1:], ref, atol=2e-5)
    # no-op when the grid already matches
    pos = rng.normal(size=(1 + 196, 16)).astype(np.float32)
    assert interpolate_vision_pos(pos, 196) is pos


def test_conch_pos_resample_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F

    from moc_tpu.nn.vit import resample_pos_embed

    rng = np.random.default_rng(1)
    og, ng, d = 14, 28, 24
    pos = rng.normal(size=(1, 1 + og * og, d)).astype(np.float32)
    ours = np.asarray(resample_pos_embed(pos, ng))
    pt = torch.from_numpy(pos[:, 1:]).reshape(1, og, og, d).permute(0, 3, 1, 2)
    pt = F.interpolate(pt, size=(ng, ng), mode="bilinear", align_corners=False)
    ref = pt.permute(0, 2, 3, 1).reshape(ng * ng, d).numpy()
    np.testing.assert_allclose(ours[0, 1:], ref, atol=2e-5)
    np.testing.assert_array_equal(ours[0, 0], pos[0, 0])
