"""MOC train/eval CLI — the TPU-native ``main_moc.py``.

Mirrors the reference CLI surface (``/root/reference/main_moc.py:29-47``):
fold/shot/topj/topk/result_dir/dataset/pretrain/discard_classifiers/
load_weight/check_zeroshot/ablation_study/summary/summary_dir — plus
explicit path flags replacing the reference's hard-coded source lines, and a
``--dataset synthetic`` mode that self-generates a separable corpus with
oracle weights (no CONCH checkpoint required) for smoke runs and CI.

Examples:
  python -m moc_tpu.cli.main_moc --dataset synthetic --shot 2 --fold 0 \
      --topj 64 --topk 10 --num_epochs 5 --result_dir /tmp/moc_out
  python -m moc_tpu.cli.main_moc --dataset nsclc --shot 8 --fold 0 \
      --topj 400 --topk 10 --data_root /data --conch_checkpoint ckpt.bin \
      --tokenizer_file tokenizer.json
  python -m moc_tpu.cli.main_moc --summary --summary_dir results/moc_train/nsclc
"""

from __future__ import annotations

import argparse
import os
import sys

from moc_tpu.cli.common import add_perf_flags, perf_cfg_kwargs, setup_runtime


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Configurations for WSI Training")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--shot", type=int, default=1)
    p.add_argument("--topj", type=int, default=400)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--result_dir", type=str, default="results/moc_train")
    p.add_argument("--dataset", type=str, default="nsclc",
                   choices=["nsclc", "rcc", "ebrains12", "ebrains30", "synthetic"])
    p.add_argument("--pretrain", type=str, default="conch", choices=["conch"])
    p.add_argument("--disable_tqdm", action="store_true")
    p.add_argument("--discard_classifiers", nargs="+", default=[],
                   help="topk, delta_softmax, delta_diff, bottomk")
    p.add_argument("--load_weight", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--check_zeroshot", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--ablation_study", type=str, default="none",
                   choices=["none", "avg", "sum", "max"])
    p.add_argument("--summary", action="store_true")
    p.add_argument("--summary_dir", type=str, default="")
    p.add_argument("--num_epochs", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic_classes", type=int, default=2,
                   help="class count for --dataset synthetic (3+ exercises "
                        "the ovo-macro AUC path)")
    p.add_argument("--synthetic_min_patches", type=int, default=500,
                   help="synthetic-corpus bag size range (the bench protocol "
                        "uses 1500-4000 to mirror real feature bags)")
    p.add_argument("--synthetic_max_patches", type=int, default=2000)
    # explicit environment paths (hard-coded in the reference)
    from moc_tpu.config import DEFAULT_PROMPT_ROOT

    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--prompt_root", type=str, default=DEFAULT_PROMPT_ROOT,
                   help="prompt-bank dir (default: the vendored banks)")
    p.add_argument("--conch_checkpoint", type=str, default="models/conch_checkpoint.bin")
    p.add_argument("--tokenizer_file", type=str, default=None)
    p.add_argument("--weights_cache_dir", type=str, default="models/classifier_weights")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu)")
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    add_perf_flags(p)
    return p.parse_args(argv)


def _build_weights(args, preset):
    """Zero-shot weight matrices (tumor bank + extended bank), cached
    (ref ``main_moc.py:139-287``)."""
    import numpy as np

    from moc_tpu.zeroshot import (
        ConchTokenizer,
        cached_zero_shot_classifier,
        load_conch,
        load_prompt_bank,
    )
    from moc_tpu.zeroshot.classifier import make_encode_text_fn

    model, params = load_conch(args.conch_checkpoint)
    tokenizer = ConchTokenizer(args.tokenizer_file)
    encode = make_encode_text_fn(model, params)

    bank = load_prompt_bank(os.path.join(args.prompt_root, preset.prompt_file),
                            preset.label_dict)
    bank_ext = load_prompt_bank(os.path.join(args.prompt_root, preset.prompt_file_ext),
                                preset.label_dict_ext)
    cache = args.weights_cache_dir
    w = cached_zero_shot_classifier(
        os.path.join(cache, f"weights_{preset.name}_conch.npz"),
        encode, tokenizer, bank, use_cache=args.load_weight)
    w_ext = cached_zero_shot_classifier(
        os.path.join(cache, f"weights_{preset.name}_ext_conch.npz"),
        encode, tokenizer, bank_ext, use_cache=args.load_weight)
    return np.asarray(w), np.asarray(w_ext)


def _synthetic_setup(args):
    """Self-generated corpus + oracle weights (no checkpoint needed)."""
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    n_cls = getattr(args, "synthetic_classes", 2)
    min_p = getattr(args, "synthetic_min_patches", 500)
    max_p = getattr(args, "synthetic_max_patches", 2000)
    root = os.path.join(args.result_dir, "synthetic_corpus")
    if n_cls != 2:
        root = os.path.join(args.result_dir, f"synthetic_corpus_{n_cls}cls")
    if (min_p, max_p) != (500, 2000):  # size-variant corpora live apart
        root += f"_{min_p}-{max_p}p"
    if args.seed != 0:
        # the corpus cache is keyed on EVERY generator input: a different
        # seed must not silently pair fresh oracle weights with stale
        # on-disk features generated under another seed
        root += f"_s{args.seed}"
    marker = os.path.join(root, "dataset.csv")
    # 16/class: val 2 + test 4 leaves 10 ≥ the largest shot (8)
    cfg = SyntheticWSIConfig(n_classes=n_cls, slides_per_class=16,
                             min_patches=min_p, max_patches=max_p,
                             seed=args.seed)
    if not os.path.exists(marker):
        corpus = make_synthetic_corpus(
            root, cfg, shots=(1, 2, 4, 8), n_folds=5,
            val_per_class=2, test_per_class=4,
        )
    else:
        from moc_tpu.data.synthetic import zero_shot_weights

        w, w_ext = zero_shot_weights(cfg)
        corpus = {
            "csv_path": marker,
            "data_dir": os.path.join(root, "features"),
            "label_dict": {str(c): c for c in range(cfg.n_classes)},
            "split_paths": {
                (s, f): os.path.join(root, "splits", f"{s}shots", f"splits_{f}.csv")
                for s in (1, 2, 4, 8) for f in range(5)
            },
            "weights": w,
            "weights_ext": w_ext,
        }
    return corpus, cfg


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)

    if args.summary:
        from moc_tpu.moc.results import summarize

        print("start summary")
        summarize(args.summary_dir)
        print("end summary")
        return 0

    os.makedirs(args.result_dir, exist_ok=True)

    from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, read_split_csv
    from moc_tpu.moc import MOCConfig, ablation_evaluation, run_episode
    from moc_tpu.moc.results import (
        write_ablation_result,
        write_episode_result,
        write_zeroshot_result,
    )

    if args.dataset == "synthetic":
        corpus, _ = _synthetic_setup(args)
        csv_path = corpus["csv_path"]
        data_dir = corpus["data_dir"]
        label_dict = corpus["label_dict"]
        w, w_ext = corpus["weights"], corpus["weights_ext"]
        split_csv = corpus["split_paths"][(args.shot, args.fold)]
        n_classes = len(set(label_dict.values()))
        n_ext = w_ext.shape[1]
        repeat = args.shot * n_classes
    else:
        from moc_tpu.config import PRESETS

        preset = PRESETS[args.dataset]
        csv_path = preset.csv_path(args.data_root)
        data_dir = preset.data_dir(args.data_root)
        label_dict = preset.label_dict
        w, w_ext = _build_weights(args, preset)
        split_csv = preset.split_csv(args.data_root, args.shot, args.fold)
        n_classes = preset.n_classes
        n_ext = preset.n_ext_classes
        repeat = preset.repeat_num(args.shot)
    print(f"zeroshot weights: {w.shape}, ext: {w_ext.shape}")

    table = SlideTable.from_csv(csv_path, label_dict)
    loader = BagLoader(table, data_dir, cache=True)
    split = read_split_csv(split_csv)
    episode = EpisodeBags.load(loader, split.train, split.val, split.test,
                               repeat_num=repeat)

    cfg = MOCConfig(
        n_classes=n_classes, n_ext_classes=n_ext, topj=args.topj, topk=args.topk,
        discard=tuple(args.discard_classifiers), num_epochs=args.num_epochs,
        feature_dim=w.shape[0], **perf_cfg_kwargs(args),
    )

    if args.ablation_study != "none":
        metrics = ablation_evaluation(episode, w, w_ext, cfg, args.ablation_study)
        print(f"Ablation Study: {args.ablation_study}, Test: {metrics.to_dict()}")
        write_ablation_result(args.result_dir, args.ablation_study, args.shot,
                              args.fold, metrics.to_dict())
        return 0

    result = run_episode(episode, w, w_ext, cfg, seed=args.seed,
                         check_zeroshot=args.check_zeroshot, log=print)
    if args.check_zeroshot:
        write_zeroshot_result(args.result_dir, args.shot, args.fold,
                              result.zero_shot_train, result.zero_shot_val,
                              result.zero_shot_test)
    path = write_episode_result(args.result_dir, args.shot, args.fold, result)
    from moc_tpu.utils.checkpoint import save_params

    save_params(os.path.join(args.result_dir,
                             f"best_model_shot_{args.shot}_fold_{args.fold}.msgpack"),
                result.params)
    print(f"Best Val: {result.best_val}, Test at Best Val: {result.test_at_best_val}, "
          f"Test acc: {result.test_acc_at_best_val}, Best Epoch: {result.best_epoch}")
    print(f"results → {path}")
    print("\nEnd training.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
