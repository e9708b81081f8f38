"""Multi-axis distributed training tests on the virtual 8-device CPU mesh:
dp x sp x tp x ep sharded pretrain step + pipeline parallelism."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moc_tpu.nn.encoder import EncoderConfig
from moc_tpu.parallel import MoEConfig, make_mesh
from moc_tpu.parallel.pipeline import pipeline_apply
from moc_tpu.train import (
    PretrainConfig,
    encoder_param_shardings,
    make_pretrain_state,
    make_sharded_train_step,
)

CFG = PretrainConfig(
    vocab_size=256,
    max_len=64,
    encoder=EncoderConfig(embed_dim=64, ffn_dim=128, layers=2, heads=4,
                          moe_freq=2, moe=MoEConfig(n_experts=4, gate_type="top2")),
)


def _batch(seed, b=8, l=64, vocab=256):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, vocab - 1, size=(b, l)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, l)) < 0.15)
    return ids, mask


@pytest.mark.slow
def test_sharded_pretrain_step_multiaxis():
    """2 data x 2 tensor x 2 expert mesh: the step runs, params stay sharded,
    loss decreases over a few steps."""
    mesh = make_mesh({"data": 2, "tensor": 2, "expert": 2})
    model, params, optimizer, opt_state, shardings = make_pretrain_state(CFG, mesh)
    # expert params really are sharded over the expert axis
    moe_w1 = params["params"]["encoder"]["layers_1"]["moe_layer"]["experts_w1"]
    assert "expert" in str(moe_w1.sharding)
    ffn_k = params["params"]["encoder"]["layers_0"]["ffn"]["A"]["fc1"]["kernel"]
    assert "tensor" in str(ffn_k.sharding)

    step = make_sharded_train_step(CFG, mesh, model, optimizer, shardings)
    ids, mask = _batch(0)
    losses = []
    for i in range(6):
        params, opt_state, loss, aux = step(params, opt_state, ids, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_matches_single_device():
    """The same init + batch gives the same loss on a 1-device and an
    8-device (2x2x2) mesh — GSPMD partitioning must not change the math."""
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("data",))
    mesh8 = make_mesh({"data": 2, "tensor": 2, "expert": 2})

    results = []
    for mesh in (mesh1, mesh8):
        model, params, optimizer, opt_state, shardings = make_pretrain_state(
            CFG, mesh, seed=3
        )
        step = make_sharded_train_step(CFG, mesh, model, optimizer, shardings)
        ids, mask = _batch(1)
        params, opt_state, loss, aux = step(params, opt_state, ids, mask)
        _, _, loss2, _ = step(params, opt_state, ids, mask)
        results.append((float(loss), float(loss2)))
    (l1a, l1b), (l8a, l8b) = results
    assert abs(l1a - l8a) < 1e-3, (l1a, l8a)
    assert abs(l1b - l8b) < 2e-3, (l1b, l8b)


@pytest.mark.slow
def test_sequence_parallel_axis():
    """data x seq mesh: sequence dim sharded through the encoder."""
    mesh = make_mesh({"data": 2, "seq": 4})
    model, params, optimizer, opt_state, shardings = make_pretrain_state(CFG, mesh)
    step = make_sharded_train_step(CFG, mesh, model, optimizer, shardings)
    ids, mask = _batch(2)
    params, opt_state, loss, _ = step(params, opt_state, ids, mask)
    assert np.isfinite(float(loss))


def test_pipeline_apply_matches_sequential():
    """4-stage pipeline over the pipe axis == sequential stage application."""
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("pipe",))
    s, m, d = 4, 6, 16
    rng = np.random.default_rng(0)
    stage_w = jnp.asarray(rng.normal(size=(s, d, d)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.normal(size=(m, 8, d)).astype(np.float32))

    def stage_fn(w, h):
        return jnp.tanh(h @ w)

    # sequential reference
    ref = x
    for i in range(s):
        ref = jax.vmap(lambda h: stage_fn(stage_w[i], h))(ref)

    def run(stage_w_local, xs):
        return pipeline_apply(stage_fn, stage_w_local[0], xs, "pipe", s)

    out = shard_map(
        run, mesh=mesh,
        in_specs=(P("pipe"), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_w, x)
    # outputs valid on the last stage; shard_map with P() out replicates the
    # last ppermute'd value — instead compare via psum trick: gather outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_three_axis_mesh_with_sequence():
    """data x seq x expert (2x2x2) all active in one sharded train step."""
    mesh = make_mesh({"data": 2, "seq": 2, "expert": 2})
    model, params, optimizer, opt_state, shardings = make_pretrain_state(CFG, mesh)
    step = make_sharded_train_step(CFG, mesh, model, optimizer, shardings)
    ids, mask = _batch(9)
    l0 = None
    for _ in range(3):
        params, opt_state, loss, aux = step(params, opt_state, ids, mask)
        if l0 is None:
            l0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < l0


@pytest.mark.slow
def test_run_pretrain_resume_exact(tmp_path):
    """Interrupted+resumed run reproduces the uninterrupted run exactly."""
    from moc_tpu.train import run_pretrain

    mesh = make_mesh({"data": 2})
    ckpt = str(tmp_path / "ckpt")

    def data_fn(step):
        return _batch(1000 + step)

    # uninterrupted 4-step run (no checkpointing)
    p_full, _, losses_full = run_pretrain(CFG, mesh, data_fn, total_steps=4,
                                          seed=3)
    # interrupted at step 2, then resumed
    run_pretrain(CFG, mesh, data_fn, total_steps=2, ckpt_dir=ckpt,
                 ckpt_every=2, seed=3)
    p_res, _, losses_res = run_pretrain(CFG, mesh, data_fn, total_steps=4,
                                        ckpt_dir=ckpt, ckpt_every=2, seed=3)
    assert len(losses_res) == 2  # only steps 2-3 executed on resume
    np.testing.assert_allclose(losses_res, losses_full[2:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_resume_opt_state_sharded_like_fresh(tmp_path):
    """Restored optimizer moments must carry the SAME shardings
    optimizer.init gave a fresh state (review r3: a plain asarray restore
    materialized them replicated, OOMing models sized to the sharded
    budget)."""
    from moc_tpu.train import run_pretrain

    mesh = make_mesh({"data": 2, "expert": 2})
    ckpt = str(tmp_path / "ckpt2")

    def data_fn(step):
        return _batch(2000 + step)

    run_pretrain(CFG, mesh, data_fn, total_steps=2, ckpt_dir=ckpt,
                 ckpt_every=2, seed=4)
    # resume with start == total_steps: restores state and returns it as-is
    _, opt_res, losses = run_pretrain(CFG, mesh, data_fn, total_steps=2,
                                      ckpt_dir=ckpt, ckpt_every=2, seed=4)
    assert losses == []  # nothing re-executed
    _, _, _, opt_fresh, _ = make_pretrain_state(CFG, mesh, seed=4)
    fresh_leaves = jax.tree_util.tree_leaves(opt_fresh)
    res_leaves = jax.tree_util.tree_leaves(opt_res)
    assert len(fresh_leaves) == len(res_leaves)
    checked = 0
    for fresh, res in zip(fresh_leaves, res_leaves):
        if hasattr(fresh, "sharding") and fresh.ndim > 0:
            assert fresh.sharding.is_equivalent_to(res.sharding, fresh.ndim), (
                fresh.sharding, res.sharding)
            checked += 1
    assert checked > 0
