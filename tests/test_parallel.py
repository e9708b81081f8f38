"""Tests for mesh helpers, dilated attention, and the MoE layer — including
multi-device sharded execution on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from moc_tpu.parallel import (
    DilatedConfig,
    MoEConfig,
    MoELayer,
    dilated_attention,
    make_mesh,
    moe_dispatch_combine,
    top1_gate,
    top2_gate,
)
from moc_tpu.parallel.dilated import dense_to_sparse, sparse_to_dense
from moc_tpu.ops.flash_attention import mha_reference


def test_make_mesh_fill():
    mesh = make_mesh({"data": -1, "expert": 2})
    assert mesh.shape["expert"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2


def test_hybrid_mesh_ici_axes_stay_in_slice():
    # simulate 2 DCN slices of 4 devices each on the virtual 8-CPU mesh:
    # walking any ICI axis must never change the (contiguous-group) slice id
    devs = jax.devices()
    from moc_tpu.parallel import make_hybrid_mesh

    hm = make_hybrid_mesh({"data": 2, "tensor": 2, "expert": 2},
                          dcn_axes=("data",), num_slices=2)
    assert hm.axis_names == ("data", "tensor", "expert")
    slice_of = {d: i // 4 for i, d in enumerate(devs)}
    arr = hm.devices  # [data=2, tensor=2, expert=2]
    # fixing the data coordinate pins the slice
    for di in range(2):
        ids = {slice_of[d] for d in arr[di].ravel()}
        assert len(ids) == 1, f"ICI block {di} spans slices {ids}"
    # the two data coordinates live on different slices
    assert slice_of[arr[0, 0, 0]] != slice_of[arr[1, 0, 0]]


def test_hybrid_mesh_fill_and_errors():
    from moc_tpu.parallel import make_hybrid_mesh

    hm = make_hybrid_mesh({"data": 2, "tensor": -1}, num_slices=2)
    assert hm.shape["tensor"] == len(jax.devices()) // 2
    with pytest.raises(ValueError, match="unknown mesh axes"):
        # ("pipe" became a real axis in r5 — GPipe trainer; use a bogus name)
        make_hybrid_mesh({"stage": 2}, num_slices=2)
    with pytest.raises(ValueError, match="missing from axis_sizes"):
        make_hybrid_mesh({"tensor": 2}, dcn_axes=("data",), num_slices=2)
    with pytest.raises(ValueError, match="multiply to"):
        # dcn axis sized 4 but only 2 slices
        make_hybrid_mesh({"data": 4, "tensor": 2}, num_slices=2)
    with pytest.raises(ValueError, match="do not split"):
        make_hybrid_mesh({"data": 3, "tensor": -1}, num_slices=3)


def test_hybrid_mesh_runs_sharded_psum():
    from moc_tpu.parallel import make_hybrid_mesh

    hm = make_hybrid_mesh({"data": 2, "tensor": 4}, num_slices=2)
    x = jnp.arange(8.0).reshape(2, 4)
    y = jax.jit(
        shard_map(lambda a: jax.lax.psum(a, "tensor"),
                  mesh=hm, in_specs=P("data", "tensor"),
                  out_specs=P("data", None)),
    )(x)
    np.testing.assert_allclose(np.asarray(y)[:, 0],
                               np.asarray(x).sum(axis=1))


def test_dense_sparse_roundtrip():
    rng = np.random.default_rng(0)
    b, l, h, d = 2, 16, 4, 8
    x = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    for ratio in (1, 2, 4):
        sp = dense_to_sparse(x, ratio)
        assert sp.shape == (b, l // ratio, h, d)
        # head-group r sees tokens at offset r: verify against direct slicing
        h2 = -(-h // ratio)
        for head in range(h):
            r = head // h2
            np.testing.assert_allclose(
                np.asarray(sp[:, :, head]), np.asarray(x[:, r::ratio, head]),
                err_msg=f"ratio={ratio} head={head}",
            )


def test_sparse_to_dense_coverage():
    rng = np.random.default_rng(1)
    b, ls, h, d, ratio = 1, 8, 4, 8, 2
    out = jnp.asarray(rng.normal(size=(b, ls, h, d)).astype(np.float32))
    lse = jnp.asarray(rng.normal(size=(b, h, ls)).astype(np.float32))
    dense, lse_dense = sparse_to_dense(out, lse, ratio)
    assert dense.shape == (b, h, ls * ratio, d)
    assert lse_dense.shape == (b, h, ls * ratio)
    h2 = h // ratio
    for head in range(h):
        r = head // h2
        covered = np.asarray(lse_dense[0, head]) > -1e7
        expect = np.zeros(ls * ratio, bool)
        expect[r::ratio] = True
        np.testing.assert_array_equal(covered, expect)
        np.testing.assert_allclose(np.asarray(dense[0, head, r::ratio]),
                                   np.asarray(out[0, :, head]))


def test_dilated_equals_full_attention_when_trivial():
    """segment = whole sequence, ratio 1 → plain attention."""
    rng = np.random.default_rng(2)
    b, l, h, d = 2, 128, 4, 128
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    cfg = DilatedConfig(segment_lengths=(128,), dilated_ratios=(1,), use_flash=False)
    out = dilated_attention(q, k, v, cfg)
    ref, _ = mha_reference(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                           v.transpose(0, 2, 1, 3))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, l, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dilated_multibranch_finite_and_weighted():
    rng = np.random.default_rng(3)
    b, l, h, d = 1, 256, 4, 128
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k, v = q * 0.5, q * 0.25
    cfg = DilatedConfig(segment_lengths=(64, 128, 256), dilated_ratios=(1, 2, 4),
                        use_flash=False)
    out = dilated_attention(q, k, v, cfg, causal=True)
    assert out.shape == (b, l, h * d)
    assert np.all(np.isfinite(np.asarray(out)))
    g = jax.grad(lambda q: jnp.sum(dilated_attention(q, k, v, cfg) ** 2))(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_dilated_sequence_parallel_matches_single_device():
    """KV all-gather context parallelism over 4 shards == unsharded result."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(4)
    b, l, h, d = 1, 512, 4, 128
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    cfg = DilatedConfig(segment_lengths=(512,), dilated_ratios=(1,), use_flash=False)

    full = dilated_attention(q, k, v, cfg)

    sharded = shard_map(
        functools.partial(dilated_attention, cfg=cfg, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("ratio,subgroup", [(1, False), (2, False), (1, True)])
def test_dilated_causal_sequence_parallel_matches_single_device(ratio, subgroup):
    """Causal cross-shard segments (block-decomposed + lse merge) == unsharded."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(6)
    b, l, h, d = 1, 512, 4, 128
    # subgroup: segment spans only 2 of the 4 ranks
    sl = 256 if subgroup else 512
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    cfg = DilatedConfig(segment_lengths=(sl,), dilated_ratios=(ratio,),
                        use_flash=False)

    full = dilated_attention(q, k, v, cfg, causal=True)

    sharded = shard_map(
        functools.partial(dilated_attention, cfg=cfg, causal=True,
                          axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal,ratio,sl", [
    (False, 1, 512), (True, 1, 512), (True, 2, 512), (False, 1, 256),
])
@pytest.mark.slow
def test_dilated_ring_gather_matches_allgather(causal, ratio, sl):
    """gather_mode='ring' (ppermute block rotation) == 'allgather'."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(8)
    b, l, h, d = 1, 512, 4, 128
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))

    def run(mode):
        cfg = DilatedConfig(segment_lengths=(sl,), dilated_ratios=(ratio,),
                            use_flash=False, gather_mode=mode)
        return shard_map(
            functools.partial(dilated_attention, cfg=cfg, causal=causal,
                              axis_name="seq"),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
        )(q, k, v)

    np.testing.assert_allclose(np.asarray(run("ring")),
                               np.asarray(run("allgather")),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_encoder_ring_axis_matches_unsharded():
    """Encoder with ring_axis under shard_map == plain encoder, same params."""
    from moc_tpu.nn.encoder import Encoder, EncoderConfig

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    base = EncoderConfig(embed_dim=64, ffn_dim=128, layers=2, heads=4)
    ring = EncoderConfig(embed_dim=64, ffn_dim=128, layers=2, heads=4,
                         ring_axis="seq")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 256, 64)).astype(np.float32))
    params = Encoder(base).init(jax.random.PRNGKey(0), x)
    full, _ = Encoder(base).apply(params, x)

    def fwd(params, x):
        out, aux = Encoder(ring).apply(params, x)
        return out

    sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "seq")),
        out_specs=P(None, "seq"),
    )(params, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("gate", [top1_gate, top2_gate])
def test_gates_dispatch_invariants(gate):
    rng = np.random.default_rng(5)
    s, e, c = 64, 4, 24
    logits = jnp.asarray(rng.normal(size=(s, e)).astype(np.float32))
    combine, dispatch, aux = gate(logits, c)
    assert combine.shape == (s, e, c)
    d = np.asarray(dispatch)
    # every capacity slot holds at most one token
    assert (d.sum(axis=0) <= 1 + 1e-6).all()
    # each token occupies at most 1 (top1) / 2 (top2) slots
    per_token = d.reshape(s, -1).sum(axis=1)
    assert per_token.max() <= (1 if gate is top1_gate else 2)
    assert float(aux) > 0
    # combine weights ≤ 1 and only where dispatched
    cmb = np.asarray(combine)
    assert (cmb[~d] == 0).all()


@pytest.mark.parametrize("gate_type", ["top1", "top2"])
@pytest.mark.parametrize("masked", [False, True])
def test_moe_gather_dispatch_matches_einsum(gate_type, masked):
    """dispatch_impl='gather' (scatter token indices → row gathers) produces
    the SAME outputs, aux, and parameter gradients as the GShard [S,E,C]
    einsum formulation — including capacity drops and padded tokens."""
    import dataclasses

    rng = np.random.default_rng(17)
    s, dim = 96, 32
    x = jnp.asarray(rng.normal(size=(s, dim)).astype(np.float32))
    mask = jnp.asarray(rng.random(s) < 0.25) if masked else None
    # capacity_factor < 1 forces real drops through both formulations
    base = MoEConfig(n_experts=4, gate_type=gate_type, capacity_factor=0.75)
    outs, grads = {}, {}
    for impl in ("einsum", "gather"):
        cfg = dataclasses.replace(base, dispatch_impl=impl)
        layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg)
        params = layer.init(jax.random.PRNGKey(0), x, mask)
        y, aux = jax.jit(layer.apply)(params, x, mask)
        outs[impl] = (np.asarray(y), float(aux))

        def loss(p):
            y, aux = layer.apply(p, x, mask)
            return jnp.sum(y**2) + 0.01 * aux

        grads[impl] = jax.grad(loss)(params)
    np.testing.assert_allclose(outs["gather"][0], outs["einsum"][0],
                               rtol=1e-5, atol=1e-6)
    assert outs["gather"][1] == pytest.approx(outs["einsum"][1], rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        grads["gather"], grads["einsum"])


def test_moe_gather_dispatch_expert_parallel():
    """The gather formulation rides the same all_to_all exchange: EP over 4
    devices == local execution, dispatch_impl='gather'."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("expert",))
    rng = np.random.default_rng(19)
    s, dim = 128, 32
    x = jnp.asarray(rng.normal(size=(s, dim)).astype(np.float32))
    cfg = MoEConfig(n_experts=4, gate_type="top2", dispatch_impl="gather")
    local_layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg)
    params = local_layer.init(jax.random.PRNGKey(0), x)
    y_local, aux_local = local_layer.apply(params, x)
    ep_layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg, axis_name="expert")
    y_ep, aux_ep = shard_map(
        lambda x, p: ep_layer.apply(p, x), mesh=mesh,
        in_specs=(P(), P()), out_specs=(P(), P()), check_vma=False,
    )(x, params)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_local),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_local), rtol=1e-5)


def test_moe_einsum_bf16_dispatch_tracks_f32():
    """The einsum_bf16 A/B arm stays close to the exact path (bf16 rounding
    of gate weights and operands only)."""
    import dataclasses

    rng = np.random.default_rng(23)
    s, dim = 64, 32
    x = jnp.asarray(rng.normal(size=(s, dim)).astype(np.float32))
    base = MoEConfig(n_experts=4, gate_type="top2")
    ys = {}
    for impl in ("einsum", "einsum_bf16"):
        cfg = dataclasses.replace(base, dispatch_impl=impl)
        layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg)
        params = layer.init(jax.random.PRNGKey(0), x)
        ys[impl], _ = layer.apply(params, x)
    diff = np.abs(np.asarray(ys["einsum_bf16"]) - np.asarray(ys["einsum"]))
    assert float(np.median(diff)) < 0.01
    assert np.all(np.isfinite(np.asarray(ys["einsum_bf16"])))


def test_moe_layer_single_device():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    layer = MoELayer(dim=32, hidden_dim=64, cfg=MoEConfig(n_experts=4, gate_type="top2"))
    params = layer.init(jax.random.PRNGKey(0), x)
    y, aux = layer.apply(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x)[0] ** 2) + 0.01 * layer.apply(p, x)[1])(params)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree.leaves(g))


def test_moe_expert_parallel_matches_single_device():
    """all_to_all expert parallelism over 4 devices == local execution."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("expert",))
    rng = np.random.default_rng(7)
    s, dim = 128, 32
    x = jnp.asarray(rng.normal(size=(s, dim)).astype(np.float32))
    cfg = MoEConfig(n_experts=4, gate_type="top1", capacity_factor=2.0)

    local_layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg)
    params = local_layer.init(jax.random.PRNGKey(0), x)
    y_local, aux_local = local_layer.apply(params, x)

    ep_layer = MoELayer(dim=dim, hidden_dim=64, cfg=cfg, axis_name="expert")

    def run(x, params):
        return ep_layer.apply(params, x)

    y_ep, aux_ep = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P()),  # tokens + params replicated; experts split inside
        out_specs=(P(), P()),
        check_vma=False,
    )(x, params)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_local), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_local), rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal):
    """Ring attention over 4 sequence shards == unsharded full attention."""
    from moc_tpu.parallel import ring_attention

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(11)
    b, h, l, d = 1, 2, 512, 128
    q = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))

    full, _ = mha_reference(q, k, v, causal=causal)

    out = shard_map(
        functools.partial(ring_attention, axis_name="seq", causal=causal,
                          use_flash=False),
        mesh=mesh,
        in_specs=(P(None, None, "seq"), P(None, None, "seq"), P(None, None, "seq")),
        out_specs=P(None, None, "seq"),
        check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), rtol=3e-4, atol=3e-4)


def test_moe_layer_pad_invariance():
    """Padding tokens must not occupy expert capacity, perturb the aux loss,
    or receive expert output (review r3: the mask was unreachable — pad
    tokens overflowed experts and dropped real tokens). Capacity is a
    function of the STATIC padded length, so the invariant is pad-CONTENT
    invariance at fixed shape."""
    rng = np.random.default_rng(8)
    real = jnp.asarray(rng.normal(size=(48, 32)).astype(np.float32))
    # tight capacity so stray pad routing WOULD displace real tokens
    cfg = MoEConfig(n_experts=4, gate_type="top2", capacity_factor=1.0)
    layer = MoELayer(dim=32, hidden_dim=64, cfg=cfg)
    params = layer.init(jax.random.PRNGKey(0), real)

    mask = jnp.concatenate([jnp.zeros((48,), bool), jnp.ones((16,), bool)])
    pad_a = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    pad_b = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 10)
    y_a, aux_a = layer.apply(params, jnp.concatenate([real, pad_a]), mask)
    y_b, aux_b = layer.apply(params, jnp.concatenate([real, pad_b]), mask)

    np.testing.assert_allclose(np.asarray(y_a[:48]), np.asarray(y_b[:48]),
                               rtol=1e-5, atol=1e-6)
    # NOTE: aux is intentionally NOT asserted equal — the reference computes
    # me = mean(gates) over ALL tokens including pads (routing.py:94-99,
    # 345-350) and parity wins; only routing/capacity/outputs are masked
    assert np.isfinite(float(aux_a)) and np.isfinite(float(aux_b))
    # pad rows receive no expert output at all
    np.testing.assert_allclose(np.asarray(y_a[48:]), 0.0, atol=1e-6)
    # sanity: WITHOUT the mask the adversarial rows do change real outputs
    y_nomask, _ = layer.apply(params, jnp.concatenate([real, pad_b]))
    assert not np.allclose(np.asarray(y_nomask[:48]), np.asarray(y_b[:48]),
                           rtol=1e-5, atol=1e-6)


def test_encoder_moe_block_pad_invariance():
    """Through the encoder: an MoE block fed different pad-row CONTENT at
    the same padded shape produces identical real-position outputs."""
    from moc_tpu.nn.encoder import Encoder, EncoderConfig

    cfg = EncoderConfig(embed_dim=32, ffn_dim=64, layers=2, heads=4,
                        moe_freq=2, moe=MoEConfig(n_experts=4,
                                                  gate_type="top2",
                                                  capacity_factor=1.0))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    enc = Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x)
    pad = jnp.concatenate([jnp.zeros((2, 12), bool), jnp.ones((2, 4), bool)],
                          axis=1)
    pads = [jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * s)
            for s in (1.0, 10.0)]
    outs = [enc.apply(params, jnp.concatenate([x, p], axis=1),
                      padding_mask=pad)[0] for p in pads]
    np.testing.assert_allclose(np.asarray(outs[0][:, :12]),
                               np.asarray(outs[1][:, :12]),
                               rtol=1e-4, atol=1e-5)


def test_dilated_pad_keys_excluded_non_divisible():
    """Zero pad keys (segment tail + ratio padding) must not enter the
    softmax denominators: non-divisible shapes match a dense per-head-group
    oracle that excludes pads entirely (review r3 — previously the pads
    diluted outputs AND the sl%dr!=0 reshape crashed outright)."""
    from moc_tpu.parallel import DilatedConfig, dilated_attention

    rng = np.random.default_rng(0)
    b, l, h, d = 2, 20, 4, 8
    q = rng.normal(size=(b, l, h, d)).astype(np.float32)
    k = rng.normal(size=(b, l, h, d)).astype(np.float32)
    v = rng.normal(size=(b, l, h, d)).astype(np.float32)
    sl, dr = 8, 3  # 20 pads to 24 (seq), 8 pads to 9 (ratio)
    cfg = DilatedConfig(segment_lengths=(sl,), dilated_ratios=(dr,),
                        use_flash=False)
    got = np.asarray(dilated_attention(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), cfg))
    h2 = -(-h // dr)
    want = np.zeros((b, l, h * d), np.float32)
    for bi in range(b):
        for hh in range(h):
            j = hh // h2
            for lo in range(0, l, sl):
                pos = [p for p in range(lo, min(lo + sl, l))
                       if (p - lo) % dr == j]
                if not pos:
                    continue
                s = (q[bi, pos, hh] @ k[bi, pos, hh].T) * (d ** -0.5)
                p_ = np.exp(s - s.max(1, keepdims=True))
                out = (p_ / p_.sum(1, keepdims=True)) @ v[bi, pos, hh]
                want[bi, pos, hh * d:(hh + 1) * d] = out  # single branch
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_flash_with_lse_differentiable():
    """flash_attention_with_lse carries gradients (custom_vjp with the
    dense-reference backward) — the dilated/ring training path depends on
    it (review r3: the raw pallas_call had no VJP and raised under grad)."""
    from moc_tpu.ops.flash_attention import (flash_attention_with_lse,
                                             mha_reference)

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 128, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 128, 16)).astype(np.float32))

    def loss(fn):
        def run(q):
            o, l = fn(q, k, v, causal=True)
            return jnp.sum(o * o) + jnp.sum(l)
        return run

    gf = jax.grad(loss(flash_attention_with_lse))(q)
    gr = jax.grad(loss(mha_reference))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)


def test_dilated_flash_sg_grads_match_dense():
    """The dilated branch's new ``lse_grad=False`` flash route (Pallas bwd,
    lse stop-gradiented into the recombination weights) produces the same
    gradients as the dense formulation — the recombination weights are
    stop-gradiented in BOTH modes, so the two must agree analytically."""
    from moc_tpu.parallel.dilated import DilatedConfig, dilated_attention

    rng = np.random.default_rng(5)
    b, l, h, d = 1, 256, 2, 128  # lane-aligned so the Pallas path engages
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    cfg_flash = DilatedConfig(segment_lengths=(128, 256),
                              dilated_ratios=(1, 2), use_flash=True)
    cfg_dense = DilatedConfig(segment_lengths=(128, 256),
                              dilated_ratios=(1, 2), use_flash=False)

    def loss(cfg):
        return lambda q_: jnp.sum(dilated_attention(q_, k, v, cfg) ** 2)

    out_f = dilated_attention(q, k, v, cfg_flash)
    out_d = dilated_attention(q, k, v, cfg_dense)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)
    g_f = jax.grad(loss(cfg_flash))(q)
    g_d = jax.grad(loss(cfg_dense))(q)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d),
                               rtol=5e-4, atol=5e-4)
