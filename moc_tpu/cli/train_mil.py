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


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Baseline MIL fold training")
    p.add_argument("--model_type", default="clam_sb",
                   choices=["clam_sb", "clam_mb", "abmil", "transmil", "mil",
                            "chief", "titan"])
    p.add_argument("--model_size", default="conch")
    p.add_argument("--dataset", default="synthetic",
                   choices=["nsclc", "rcc", "synthetic"])
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--shot", type=int, default=4)
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
    p.add_argument("--log_data", action="store_true",
                   help="write train/val scalars (JSONL + TensorBoard) "
                        "under <result_dir>/tb")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = get_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.result_dir, exist_ok=True)

    from moc_tpu.data import BagLoader, SlideTable, read_split_csv
    from moc_tpu.train import MilTrainConfig, train_fold

    if args.dataset == "synthetic":
        from moc_tpu.cli.main_moc import _synthetic_setup

        corpus, _ = _synthetic_setup(args)
        csv_path, data_dir = corpus["csv_path"], corpus["data_dir"]
        label_dict = corpus["label_dict"]
        split_csv = corpus["split_paths"][(args.shot, args.fold)]
        n_classes = len(set(label_dict.values()))
    else:
        from moc_tpu.config import PRESETS

        preset = PRESETS[args.dataset]
        csv_path = preset.csv_path(args.data_root)
        data_dir = preset.data_dir(args.data_root)
        label_dict = preset.label_dict
        split_csv = preset.split_csv(args.data_root, args.shot, args.fold)
        n_classes = preset.n_classes

    table = SlideTable.from_csv(csv_path, label_dict)
    split = read_split_csv(split_csv)
    parts = {"train": split.train, "val": split.val, "test": split.test}
    loaders = {
        name: (lambda ids=ids: BagLoader(table.subset_by_slide_ids(ids), data_dir,
                                         cache=True)
               .batches(batch_size=max(args.batch_size, 1)))
        for name, ids in parts.items()
    }

    cfg = MilTrainConfig(
        model_type=args.model_type, model_size=args.model_size,
        n_classes=n_classes, drop_out=args.drop_out, bag_loss=args.bag_loss,
        inst_loss=args.inst_loss, subtyping=args.subtyping, B=args.B,
        bag_weight=args.bag_weight, lr=args.lr, reg=args.reg, opt=args.opt,
        max_epochs=args.max_epochs, early_stopping=args.early_stopping,
        weighted_sample=args.weighted_sample, batch_size=args.batch_size,
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
