"""Baseline MIL fold-training CLI (the driver around ``core_utils.train``).

The reference keeps this loop in ``utils/core_utils.py`` invoked from
scripts that are not in the repo; here it is a first-class entry point:

  python -m moc_tpu.cli.train_mil --model_type clam_sb --dataset synthetic \
      --shot 4 --fold 0 --max_epochs 10 --result_dir /tmp/mil_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys


from moc_tpu.cli.common import setup_runtime


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Baseline MIL fold training")
    p.add_argument("--model_type", default="clam_sb",
                   choices=["clam_sb", "clam_mb", "abmil", "transmil", "mil",
                            "chief", "titan", "vila"])
    p.add_argument("--model_size", default="conch")
    p.add_argument("--dataset", default="synthetic",
                   choices=["nsclc", "rcc", "synthetic"])
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--shot", type=int, default=4)
    p.add_argument("--folds", type=int, nargs="+", default=None,
                   help="train several folds in one invocation and write a "
                        "<model>_summary_<shot>.csv with a mean row "
                        "(the reference's 5-fold statistical protocol)")
    p.add_argument("--shots", type=int, nargs="+", default=None)
    p.add_argument("--fused", action="store_true",
                   help="train all folds of a shot as ONE vmapped program "
                        "(few-shot grids; folds shard over devices; not "
                        "available for vila)")
    p.add_argument("--drop_out", type=float, default=0.0)
    p.add_argument("--bag_loss", default="ce", choices=["ce", "svm"])
    p.add_argument("--inst_loss", default="ce", choices=["ce", "svm"])
    p.add_argument("--subtyping", action="store_true")
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--bag_weight", type=float, default=0.7)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg", type=float, default=1e-5)
    p.add_argument("--opt", default="adam", choices=["adam", "adamw", "sgd"])
    p.add_argument("--max_epochs", type=int, default=20)
    p.add_argument("--early_stopping", action="store_true")
    p.add_argument("--weighted_sample", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--result_dir", default="results/mil_train")
    p.add_argument("--data_root", default="data")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    p.add_argument("--log_data", action="store_true",
                   help="write train/val scalars (JSONL + TensorBoard) "
                        "under <result_dir>/tb")
    # ViLa dual-scale options (ref Generic_MIL_Dataset_ViLa + config.text_prompt)
    p.add_argument("--data_dir_l", default=None,
                   help="large-scale feature dir for --model_type vila "
                        "(defaults to the small-scale dir)")
    p.add_argument("--vila_prompt_csv", default=None,
                   help="two-scale full-sentence prompt CSV; a synthetic "
                        "prompt set is generated when omitted")
    p.add_argument("--conch_checkpoint", default=None,
                   help="CONCH checkpoint for the prompt token-embedding "
                        "table (random table when omitted, synthetic only)")
    return p.parse_args(argv)


def _train_vila(args, table, parts, data_dir, n_classes) -> dict:
    """ViLa fold training (the reference dispatches 'vila' inside
    ``core_utils.train``; its data interface is dual-scale bag pairs plus
    CONCH prompt constants, so it gets its own branch here)."""
    import numpy as np

    from moc_tpu.data.vila_data import DualScaleLoader
    from moc_tpu.models import build_prompt_constants
    from moc_tpu.models.vila import VilaConfig, load_vila_prompts
    from moc_tpu.train import VilaTrainConfig, train_vila_fold
    from moc_tpu.zeroshot import ConchTokenizer
    from moc_tpu.zeroshot.text_tower import TextConfig

    use_h5 = os.path.isdir(os.path.join(data_dir, "h5_files"))
    loader = DualScaleLoader(table, data_dir, args.data_dir_l or data_dir,
                             use_h5=use_h5)
    splits = {name: loader.read_all(ids) for name, ids in parts.items()}
    feat_dim = int(splits["train"][0].feats_s.shape[-1])

    if args.vila_prompt_csv:
        classnames = load_vila_prompts(args.vila_prompt_csv)
    else:
        # synthetic two-scale prompts; class words must land past the
        # soft-prompt window (positions 1..16 are replaced by learned ctx)
        tmpl = ("an image patch of tissue sampled from a surgical resection "
                "specimen processed and stained with hematoxylin and eosin "
                "at SCALE magnification showing morphology consistent with "
                "subtype TYPE")
        classnames = [tmpl.replace("SCALE", s).replace("TYPE", f"class{c}")
                      for s in ("low", "high") for c in range(n_classes)]

    tokenizer = ConchTokenizer(args.tokenizer_file) if getattr(
        args, "tokenizer_file", None) else ConchTokenizer()
    text_params = None
    if args.conch_checkpoint:
        from moc_tpu.zeroshot.convert import load_conch

        _, conch_params = load_conch(args.conch_checkpoint)
        table_np = np.asarray(
            conch_params["params"]["text"]["token_embedding"]["embedding"])
        # the full pretrained text tower initializes ViLaTextEncoder (the
        # reference wraps conch_model.text, model_ViLa_MIL.py:301-302) —
        # only the token table feeds the prompt constants
        text_params = conch_params["params"]["text"]
        text_cfg = TextConfig(output_dim=feat_dim)
    else:
        rng = np.random.default_rng(args.seed)
        text_cfg = TextConfig(context_length=128, vocab_size=32007, width=64,
                              heads=4, layers=2, output_dim=feat_dim)
        table_np = rng.normal(size=(text_cfg.vocab_size, text_cfg.width)
                              ).astype(np.float32) * 0.02
    prompts = build_prompt_constants(table_np, tokenizer, classnames)

    cfg = VilaTrainConfig(
        model=VilaConfig(n_classes=n_classes, input_size=feat_dim,
                         text=text_cfg),
        lr=args.lr, reg=args.reg, max_epochs=args.max_epochs,
        early_stopping=args.early_stopping, seed=args.seed,
    )
    result = train_vila_fold(splits, prompts, cfg, log=print,
                             text_params=text_params)

    payload = {
        "val_auc": result.val_auc, "test_auc": result.test_auc,
        "test_acc": result.test_acc, "stop_epoch": result.stop_epoch,
        # model config sidecar: lets predict/visualize auto-detect the
        # architecture of the msgpack written below
        "model_type": "vila", "n_classes": n_classes,
    }
    out = os.path.join(args.result_dir,
                       f"vila_shot_{args.shot}_fold_{args.fold}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=4)
    from moc_tpu.utils.checkpoint import save_params

    save_params(out.replace(".json", ".msgpack"), result.params)
    print(f"test auc={result.test_auc:.4f} acc={result.test_acc:.4f} → {out}")
    return payload


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)
    os.makedirs(args.result_dir, exist_ok=True)

    shots = args.shots or [args.shot]
    folds = args.folds or [args.fold]
    if args.fused and args.batch_size != 1:
        # the fused scan is inherently per-slide; silently ignoring the flag
        # would train a different trajectory than the streaming path
        raise SystemExit("--fused trains per-slide (batch_size 1); "
                         "drop --batch_size or drop --fused")
    for shot in shots:
        if args.fused and args.model_type != "vila":
            rows = _run_fused_grid(args, shot, folds)
        else:
            rows = []
            for fold in folds:
                run_args = argparse.Namespace(**{**vars(args), "shot": shot,
                                                 "fold": fold})
                rows.append(_run_single(run_args))
        if len(folds) > 1:
            import numpy as np
            import pandas as pd

            keys = [k for k in ("val_auc", "test_auc", "test_acc", "test_bacc")
                    if k in rows[0]]
            frame = {"fold": list(folds) + ["mean"]}
            for k in keys:
                vals = [r[k] for r in rows]
                frame[k] = vals + [float(np.mean(vals))]
            out = os.path.join(args.result_dir,
                               f"{args.model_type}_summary_{shot}.csv")
            pd.DataFrame(frame).to_csv(out, index=False)
            print(f"summary → {out}")
    return 0


def _resolve_dataset(args, shot, fold):
    """(table, data_dir, split, n_classes) for one (shot, fold)."""
    from moc_tpu.data import SlideTable, read_split_csv

    if args.dataset == "synthetic":
        from moc_tpu.cli.main_moc import _synthetic_setup

        run_args = argparse.Namespace(**{**vars(args), "shot": shot,
                                         "fold": fold})
        corpus, _ = _synthetic_setup(run_args)
        csv_path, data_dir = corpus["csv_path"], corpus["data_dir"]
        label_dict = corpus["label_dict"]
        split_csv = corpus["split_paths"][(shot, fold)]
        n_classes = len(set(label_dict.values()))
    else:
        from moc_tpu.config import PRESETS

        preset = PRESETS[args.dataset]
        csv_path = preset.csv_path(args.data_root)
        data_dir = preset.data_dir(args.data_root)
        label_dict = preset.label_dict
        split_csv = preset.split_csv(args.data_root, shot, fold)
        n_classes = preset.n_classes
    table = SlideTable.from_csv(csv_path, label_dict)
    return table, data_dir, read_split_csv(split_csv), n_classes


def _run_fused_grid(args, shot, folds) -> list[dict]:
    """All folds of one shot as ONE vmapped program
    (``train.mil_fused.run_mil_folds_fused``)."""
    import jax.numpy as jnp
    import numpy as np

    from moc_tpu.data import BagLoader
    from moc_tpu.moc.sweep import pool_episode_bags, unique_split_ids
    from moc_tpu.train import MilTrainConfig
    from moc_tpu.train.mil_fused import run_mil_folds_fused_pooled
    from moc_tpu.utils.checkpoint import save_params

    splits = []
    n_classes = None
    loader = None
    for fold in folds:
        table, data_dir, split, n_classes = _resolve_dataset(args, shot, fold)
        if loader is None:
            # table/data_dir are fold-invariant: ONE cached loader
            loader = BagLoader(table, data_dir, cache=True)
        splits.append(split)
    # deduplicated transfer: folds share corpus slides (typically the whole
    # test cohort), so each unique slide is read and shipped ONCE as a pool
    # and the per-fold bags are gathered on device inside the compiled grid
    # (moc.sweep.PooledEpisodes; DESIGN.md §9b) — host-resident until the
    # trainer places it
    ids = unique_split_ids(splits)
    pooled = pool_episode_bags(loader.read_all(ids), ids, splits)

    cfg = MilTrainConfig(
        model_type=args.model_type, model_size=args.model_size,
        n_classes=n_classes, drop_out=args.drop_out, bag_loss=args.bag_loss,
        inst_loss=args.inst_loss, subtyping=args.subtyping, B=args.B,
        bag_weight=args.bag_weight, lr=args.lr, reg=args.reg, opt=args.opt,
        max_epochs=args.max_epochs, early_stopping=args.early_stopping,
        weighted_sample=args.weighted_sample,
        steps_per_epoch=int(np.asarray(pooled.index.train_idx).shape[1]),
        seed=args.seed,
    )
    result = run_mil_folds_fused_pooled(
        pooled, cfg, seeds=jnp.asarray(list(folds), jnp.int32))

    import jax

    params = jax.device_get(result.best_params)
    rows = []
    for i, fold in enumerate(folds):
        payload = {
            "val_auc": float(np.asarray(result.val_auc)[i]),
            "val_acc": float(np.asarray(result.val_acc)[i]),
            "test_auc": float(np.asarray(result.test_auc)[i]),
            "test_acc": float(np.asarray(result.test_acc)[i]),
            "test_bacc": float(np.asarray(result.test_bacc)[i]),
            "stop_epoch": int(np.asarray(result.stop_epoch)[i]),
            "model_type": args.model_type, "model_size": args.model_size,
            "n_classes": n_classes,
        }
        out = os.path.join(args.result_dir,
                           f"{args.model_type}_shot_{shot}_fold_{fold}.json")
        with open(out, "w") as f:
            json.dump(payload, f, indent=4)
        save_params(out.replace(".json", ".msgpack"),
                    jax.tree.map(lambda x: x[i], params))
        print(f"shot {shot} fold {fold}: val_auc={payload['val_auc']:.4f} "
              f"test_auc={payload['test_auc']:.4f} (fused)")
        rows.append(payload)
    return rows


def _run_single(args) -> dict:
    from moc_tpu.data import BagLoader
    from moc_tpu.train import MilTrainConfig, train_fold

    table, data_dir, split, n_classes = _resolve_dataset(args, args.shot, args.fold)
    parts = {"train": split.train, "val": split.val, "test": split.test}

    if args.model_type == "vila":
        return _train_vila(args, table, parts, data_dir, n_classes)
    from moc_tpu.data import prefetch_to_device

    # streamed, memory-bounded IO with a 2-deep device-transfer pipeline:
    # bucketization from h5 metadata, per-chunk thread-pool reads, H2D
    # overlapped with compute (the host-IO hard part of SURVEY §7)
    loaders = {
        name: (lambda ids=ids: prefetch_to_device(
            BagLoader(table.subset_by_slide_ids(ids), data_dir)
            .stream_batches(batch_size=max(args.batch_size, 1))))
        for name, ids in parts.items()
    }

    bs = max(args.batch_size, 1)
    cfg = MilTrainConfig(
        model_type=args.model_type, model_size=args.model_size,
        n_classes=n_classes, drop_out=args.drop_out, bag_loss=args.bag_loss,
        inst_loss=args.inst_loss, subtyping=args.subtyping, B=args.B,
        bag_weight=args.bag_weight, lr=args.lr, reg=args.reg, opt=args.opt,
        max_epochs=args.max_epochs, early_stopping=args.early_stopping,
        weighted_sample=args.weighted_sample, batch_size=args.batch_size,
        steps_per_epoch=-(-len(split.train) // bs),
        seed=args.seed,
    )
    writer = None
    if args.log_data:
        from moc_tpu.utils.logging import ScalarLogger

        writer = ScalarLogger(os.path.join(
            args.result_dir, "tb",
            f"{args.model_type}_shot_{args.shot}_fold_{args.fold}"))
    result = train_fold(loaders, cfg, log=print, writer=writer)
    if writer is not None:
        writer.close()
    payload = {
        "val_auc": result.val_auc, "val_acc": result.val_acc,
        "test_auc": result.test_auc, "test_acc": result.test_acc,
        "test_bacc": result.test_bacc, "stop_epoch": result.stop_epoch,
        "class_summary": result.class_summary,
        "patient_results": result.patient_results,
        "model_type": args.model_type, "model_size": args.model_size,
        "n_classes": n_classes,
    }
    out = os.path.join(
        args.result_dir,
        f"{args.model_type}_shot_{args.shot}_fold_{args.fold}.json",
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=4)
    from moc_tpu.utils.checkpoint import save_params

    save_params(out.replace(".json", ".msgpack"), result.params)
    print(f"test auc={result.test_auc:.4f} acc={result.test_acc:.4f} → {out}")
    return payload


if __name__ == "__main__":
    sys.exit(main())
