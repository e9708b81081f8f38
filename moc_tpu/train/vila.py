"""ViLa-MIL fold training over dual-scale bags.

Behavioral reference ``train_loop_vila`` / ``validate_vila``
(``/root/reference/utils/core_utils.py:435-478,650-731``): per-slide steps
over (low-scale, high-scale) feature pairs with CE on the dual-scale logits,
validation AUC model selection. The prompt constants come from the CONCH
token-embedding table (``models/vila.build_prompt_constants``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moc_tpu.data.vila_data import DualScaleBag
from moc_tpu.models.vila import PromptConstants, ViLaMIL, VilaConfig
from moc_tpu.train.mil import EarlyStopping, _auc_host


@dataclasses.dataclass(frozen=True)
class VilaTrainConfig:
    model: VilaConfig = VilaConfig()
    lr: float = 1e-4
    reg: float = 1e-5
    max_epochs: int = 20
    patience: int = 20
    stop_epoch: int = 50
    early_stopping: bool = False
    seed: int = 1


@dataclasses.dataclass
class VilaFoldResult:
    val_auc: float
    test_auc: float
    test_acc: float
    stop_epoch: int
    params: dict


def evaluate_vila(cfg: VilaTrainConfig, params,
                  bags: Sequence[DualScaleBag], prompts: PromptConstants) -> dict:
    """Standalone ViLa checkpoint evaluation (the vila arm of
    ``eval_utils.eval``, ``/root/reference/utils/eval_utils.py:66-76``):
    probs/preds + AUC/acc over a dual-scale bag stream."""
    model = ViLaMIL(cfg.model)

    @jax.jit
    def infer(params, bag: DualScaleBag):
        return model.apply(params, bag.feats_s, bag.mask_s, bag.feats_l,
                           bag.mask_l, prompts)["logits"]

    logits = np.stack([np.asarray(infer(params, b)) for b in bags])
    labels = np.asarray([int(b.label) for b in bags])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    preds = probs.argmax(1)
    return {
        "auc": _auc_host(probs, labels, cfg.model.n_classes),
        "acc": float((preds == labels).mean()),
        "probs": probs,
        "preds": preds,
        "labels": labels,
    }


def train_vila_fold(
    splits: dict[str, Sequence[DualScaleBag]],
    prompts: PromptConstants,
    cfg: VilaTrainConfig,
    *,
    log: Callable[[str], None] | None = None,
    text_params=None,
) -> VilaFoldResult:
    """``splits`` maps train/val/test → lists of ``DualScaleBag``. Bags of
    equal padded shapes share one compiled step.

    ``text_params``: converted CONCH text-tower params (the
    ``load_conch(...)["params"]["text"]`` subtree) grafted over the
    randomly initialized ``text_encoder`` — the reference builds its
    ``TextEncoder`` AROUND the pretrained conch text transformer
    (``model_ViLa_MIL.py:301-302``) and fine-tunes it with everything
    else; training the 12-layer tower from random init instead makes the
    prompt features noise."""
    model = ViLaMIL(cfg.model)
    # the reference wraps EVERY fold-trained model's optimizer — ViLa
    # included — in CosineAnnealingLR(T_max=20) stepped per epoch
    # (core_utils.py:206,232-248); one step here = one train slide
    from moc_tpu.train.mil import cosine_epoch_schedule

    schedule = cosine_epoch_schedule(cfg.lr, max(len(splits["train"]), 1))
    optimizer = optax.adamw(schedule, weight_decay=cfg.reg)

    first = splits["train"][0]
    params = model.init(jax.random.PRNGKey(cfg.seed), first.feats_s, first.mask_s,
                        first.feats_l, first.mask_l, prompts)
    if text_params is not None:
        te = dict(params["params"]["text_encoder"])
        for key in ("positional_embedding", "transformer", "ln_final",
                    "text_projection"):
            if key not in text_params:
                raise ValueError(f"text_params missing {key!r}")
            te[key] = jax.tree.map(jnp.asarray, text_params[key])
        p = dict(params["params"])
        p["text_encoder"] = te
        params = {**params, "params": p}
        # structural check: the graft must not have changed any leaf shape
        chex_ok = jax.eval_shape(
            lambda p: model.apply(p, first.feats_s, first.mask_s,
                                  first.feats_l, first.mask_l, prompts),
            params)
        del chex_ok
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, bag: DualScaleBag):
        def loss_fn(p):
            out = model.apply(p, bag.feats_s, bag.mask_s, bag.feats_l, bag.mask_l,
                              prompts)
            return optax.softmax_cross_entropy_with_integer_labels(
                out["logits"][None], bag.label[None]
            )[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def infer(params, bag: DualScaleBag):
        return model.apply(params, bag.feats_s, bag.mask_s, bag.feats_l,
                           bag.mask_l, prompts)["logits"]

    def evaluate(split: str):
        logits = np.stack([np.asarray(infer(params, b)) for b in splits[split]])
        labels = np.asarray([int(b.label) for b in splits[split]])
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
        return {
            "auc": _auc_host(probs, labels, cfg.model.n_classes),
            "acc": float((probs.argmax(1) == labels).mean()),
        }

    stopper = EarlyStopping(cfg.patience, cfg.stop_epoch)
    stop_at = cfg.max_epochs
    rng = np.random.default_rng(cfg.seed)
    for epoch in range(cfg.max_epochs):
        for i in rng.permutation(len(splits["train"])):
            params, opt_state, loss = train_step(params, opt_state,
                                                 splits["train"][int(i)])
        val = evaluate("val")
        if log:
            log(f"epoch {epoch}: val auc={val['auc']:.4f} acc={val['acc']:.4f}")
        stopper(epoch, val["auc"], params)
        if cfg.early_stopping and stopper.early_stop:
            stop_at = epoch
            break
    if stopper.best_params is not None:
        params = jax.device_put(stopper.best_params)
    val = evaluate("val")
    test = evaluate("test")
    return VilaFoldResult(val_auc=val["auc"], test_auc=test["auc"],
                          test_acc=test["acc"], stop_epoch=stop_at,
                          params=jax.device_get(params))
