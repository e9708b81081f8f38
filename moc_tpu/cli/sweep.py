"""Episode sweep CLI: every (fold, shot) on one chip/process.

The reference fans one process per (fold, shot) across GPUs via bash
(``/root/reference/scripts/moc_train.sh:23-79``). Here the sweep is a loop
sharing ONE compiled program per shape (or the fully-fused vmapped sweep for
small episodes), followed by the reference-schema summary CSVs.

  python -m moc_tpu.cli.sweep --dataset synthetic --shots 1 2 --folds 0 1 \
      --topj 64 --num_epochs 5 --result_dir /tmp/sweep_out
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def get_args(argv=None):
    p = argparse.ArgumentParser(description="MOC episode sweep")
    p.add_argument("--dataset", default="synthetic",
                   choices=["nsclc", "rcc", "ebrains12", "ebrains30", "synthetic"])
    p.add_argument("--shots", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--topj", type=int, default=400)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--num_epochs", type=int, default=25)
    p.add_argument("--result_dir", default="results/moc_sweep")
    p.add_argument("--data_root", default="data")
    p.add_argument("--prompt_root", default="models/prompts")
    p.add_argument("--conch_checkpoint", default="models/conch_checkpoint.bin")
    p.add_argument("--tokenizer_file", default=None)
    p.add_argument("--weights_cache_dir", default="models/classifier_weights")
    p.add_argument("--load_weight", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--check_zeroshot", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic_classes", type=int, default=2,
                   help="class count for --dataset synthetic")
    p.add_argument("--platform", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip (fold, shot) episodes whose result JSON exists "
                        "(preemption-safe sweeps; the reference's de-facto "
                        "per-process isolation, SURVEY.md §5.3)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = get_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.result_dir, exist_ok=True)

    from moc_tpu.cli.main_moc import _build_weights, _synthetic_setup
    from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, read_split_csv
    from moc_tpu.moc import MOCConfig, run_episode
    from moc_tpu.moc.results import episode_result_path, summarize, write_episode_result

    if args.dataset == "synthetic":
        corpus, _ = _synthetic_setup(args)
        csv_path, data_dir = corpus["csv_path"], corpus["data_dir"]
        label_dict = corpus["label_dict"]
        w, w_ext = corpus["weights"], corpus["weights_ext"]
        split_path = lambda s, f: corpus["split_paths"][(s, f)]
        n_classes = len(set(label_dict.values()))
        n_ext = w_ext.shape[1]
    else:
        from moc_tpu.config import PRESETS

        preset = PRESETS[args.dataset]
        csv_path = preset.csv_path(args.data_root)
        data_dir = preset.data_dir(args.data_root)
        label_dict = preset.label_dict
        w, w_ext = _build_weights(args, preset)
        split_path = lambda s, f: preset.split_csv(args.data_root, s, f)
        n_classes = preset.n_classes
        n_ext = preset.n_ext_classes

    table = SlideTable.from_csv(csv_path, label_dict)
    loader = BagLoader(table, data_dir, cache=True)
    cfg = MOCConfig(n_classes=n_classes, n_ext_classes=n_ext, topj=args.topj,
                    topk=args.topk, num_epochs=args.num_epochs,
                    feature_dim=w.shape[0])

    t0 = time.perf_counter()
    for shot in args.shots:
        shot_dir = os.path.join(args.result_dir, f"{shot}_shot")
        for fold in args.folds:
            if args.resume and os.path.exists(episode_result_path(shot_dir, shot, fold)):
                print(f"shot {shot} fold {fold}: done, skipping (--resume)")
                continue
            split = read_split_csv(split_path(shot, fold))
            episode = EpisodeBags.load(loader, split.train, split.val, split.test,
                                       repeat_num=shot * n_classes)
            result = run_episode(episode, w, w_ext, cfg, seed=args.seed + fold,
                                 check_zeroshot=args.check_zeroshot)
            write_episode_result(shot_dir, shot, fold, result)
            print(f"shot {shot} fold {fold}: best_val={result.best_val:.4f} "
                  f"test={result.test_at_best_val:.4f}")
    wall = time.perf_counter() - t0
    print(f"sweep wallclock: {wall:.1f}s "
          f"({len(args.shots) * len(args.folds)} episodes)")
    summarize(args.result_dir, shots=tuple(args.shots), folds=tuple(args.folds))
    return 0


if __name__ == "__main__":
    sys.exit(main())
