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


def test_pipe_trainer_matches_single_device():
    """The GPipe TRAINER (train/pretrain_pipe.py): loss AND parameter
    gradients of the 4-stage pipelined step equal the plain single-device
    MaskedTokenModel step on the same params/batch — the VERDICT r4
    certification bar for pipeline parallelism as a training feature."""
    import optax

    from moc_tpu.train.pretrain import MaskedTokenModel
    from moc_tpu.train.pretrain_pipe import (make_pipe_state,
                                             make_pipe_train_step,
                                             merge_pipe_params,
                                             split_pipe_params)

    cfg = PretrainConfig(
        vocab_size=256, max_len=64,
        encoder=EncoderConfig(embed_dim=64, ffn_dim=128, layers=4, heads=4))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
    params, optimizer, opt_state, shardings = make_pipe_state(cfg, mesh,
                                                              seed=7)
    ids, mask = _batch(5, b=8, l=64, vocab=256)

    # single-device reference on the SAME weights
    model = MaskedTokenModel(cfg)
    full = merge_pipe_params(jax.device_get(params["stages"]),
                             jax.device_get(params["shared"]))

    def ref_loss(p):
        masked = jnp.where(mask, cfg.vocab_size - 1, ids)
        logits, _ = model.apply(p, masked)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ids)
        w = mask.astype(jnp.float32)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(full)

    step = make_pipe_train_step(cfg, mesh, optimizer, shardings,
                                num_microbatches=4)
    new_params, _, loss = step(params, opt_state, ids, mask)
    assert float(loss) == pytest.approx(float(ref_l), abs=2e-5)

    # gradient equality: recompute grads through the sharded loss directly
    params2, optimizer2, opt_state2, shardings2 = make_pipe_state(
        cfg, mesh, seed=7)
    step2 = make_pipe_train_step(cfg, mesh, optimizer2, shardings2,
                                 num_microbatches=2)  # M must not matter
    _, _, loss2 = step2(params2, opt_state2, ids, mask)
    assert float(loss2) == pytest.approx(float(ref_l), abs=2e-5)

    # one-adam-step parity: pipelined updated params == reference update
    ref_opt = optax.adam(cfg.learning_rate)
    upd, _ = ref_opt.update(ref_g, ref_opt.init(full), full)
    ref_new = optax.apply_updates(full, upd)
    got_new = merge_pipe_params(jax.device_get(new_params["stages"]),
                                jax.device_get(new_params["shared"]))
    flat_got = jax.tree_util.tree_flatten_with_path(got_new)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_new)[0]
    for (path, a), (_, b) in zip(flat_got, flat_ref):
        if "k_proj']['bias" in jax.tree_util.keystr(path):
            # the loss is mathematically INVARIANT to k_proj.bias (a
            # constant key shift adds the same term to every score row →
            # softmax unchanged); its true grad is zero and both paths see
            # only float noise, which Adam's first step amplifies to
            # ±lr·sign(noise) — skip the degenerate direction
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_pipe_trainer_data_parallel_mesh():
    """data=2 x pipe=4: batch rows shard over data, stages over pipe; loss
    matches the single-device reference."""
    import optax

    from moc_tpu.train.pretrain import MaskedTokenModel
    from moc_tpu.train.pretrain_pipe import (make_pipe_state,
                                             make_pipe_train_step,
                                             merge_pipe_params)

    cfg = PretrainConfig(
        vocab_size=256, max_len=32,
        encoder=EncoderConfig(embed_dim=32, ffn_dim=64, layers=4, heads=4))
    mesh = make_mesh({"data": 2, "pipe": 4})
    params, optimizer, opt_state, shardings = make_pipe_state(cfg, mesh,
                                                              seed=9)
    ids, mask = _batch(6, b=8, l=32, vocab=256)
    model = MaskedTokenModel(cfg)
    full = merge_pipe_params(jax.device_get(params["stages"]),
                             jax.device_get(params["shared"]))
    masked = jnp.where(mask, cfg.vocab_size - 1, ids)
    logits, _ = model.apply(full, masked)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, ids)
    w = mask.astype(jnp.float32)
    ref_l = float(jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0))

    step = make_pipe_train_step(cfg, mesh, optimizer, shardings,
                                num_microbatches=2)
    _, _, loss = step(params, opt_state, ids, mask)
    assert float(loss) == pytest.approx(ref_l, abs=2e-5)


def test_pipe_trainer_rejects_moe_and_indivisible():
    from moc_tpu.train.pretrain_pipe import check_pipe_compatible

    moe_cfg = PretrainConfig(
        vocab_size=64, max_len=16,
        encoder=EncoderConfig(embed_dim=32, ffn_dim=64, layers=4, heads=4,
                              moe_freq=2, moe=MoEConfig(n_experts=4)))
    with pytest.raises(ValueError, match="homogeneous"):
        check_pipe_compatible(moe_cfg, 4)
    odd = PretrainConfig(
        vocab_size=64, max_len=16,
        encoder=EncoderConfig(embed_dim=32, ffn_dim=64, layers=6, heads=4))
    with pytest.raises(ValueError, match="divide"):
        check_pipe_compatible(odd, 4)


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
def test_run_pipe_pretrain_resume_exact(tmp_path):
    """The GPipe trainer's checkpoint/resume: interrupted+resumed == the
    uninterrupted run (same contract as run_pretrain)."""
    from moc_tpu.train.pretrain_pipe import run_pipe_pretrain

    cfg = PretrainConfig(
        vocab_size=256, max_len=32,
        encoder=EncoderConfig(embed_dim=32, ffn_dim=64, layers=4, heads=4))
    mesh = make_mesh({"pipe": 4}, jax.devices()[:4])
    ckpt = str(tmp_path / "pipe_ckpt")

    def data_fn(step):
        return _batch(3000 + step, b=8, l=32, vocab=256)

    p_full, _, losses_full = run_pipe_pretrain(
        cfg, mesh, data_fn, total_steps=4, num_microbatches=2, seed=5)
    run_pipe_pretrain(cfg, mesh, data_fn, total_steps=2,
                      num_microbatches=2, ckpt_dir=ckpt, ckpt_every=2,
                      seed=5)
    p_res, _, losses_res = run_pipe_pretrain(
        cfg, mesh, data_fn, total_steps=4, num_microbatches=2,
        ckpt_dir=ckpt, ckpt_every=2, seed=5)
    assert len(losses_res) == 2
    np.testing.assert_allclose(losses_res, losses_full[2:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_pretrain_bf16param_resume_exact(tmp_path):
    """The bf16-param recipe's (adam_state, master) opt_state tuple survives
    orbax save/restore: resumed run == uninterrupted run exactly."""
    from moc_tpu.train import run_pretrain

    cfg = PretrainConfig(
        vocab_size=256, max_len=32, param_dtype="bfloat16",
        encoder=EncoderConfig(embed_dim=32, ffn_dim=64, layers=2, heads=4,
                              compute_dtype="bfloat16"))
    mesh = make_mesh({"data": 2})
    ckpt = str(tmp_path / "bf16p_ckpt")

    def data_fn(step):
        return _batch(4000 + step, b=4, l=32, vocab=256)

    p_full, _, losses_full = run_pretrain(cfg, mesh, data_fn, total_steps=4,
                                          seed=6)
    run_pretrain(cfg, mesh, data_fn, total_steps=2, ckpt_dir=ckpt,
                 ckpt_every=2, seed=6)
    p_res, _, losses_res = run_pretrain(cfg, mesh, data_fn, total_steps=4,
                                        ckpt_dir=ckpt, ckpt_every=2, seed=6)
    assert len(losses_res) == 2
    np.testing.assert_allclose(losses_res, losses_full[2:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, np.float32),
            atol=1e-5)


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
