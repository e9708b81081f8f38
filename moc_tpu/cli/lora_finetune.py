"""LoRA / MoE-LoRA fine-tuning CLI on raw patch bags.

The trainer recipe for ``VisionTransformer(lora_rank=r, lora_experts=N)`` —
the working realization of the reference's broken ``MOELoRA``
(``/root/reference/models/lora.py:107-168``) driven by the reference's LoRA
fine-tuning protocol (``utils/lora_utils.py:38-277``): patches stream
through the adapted tower, a sorted top-q logit queue pools the slide, CE on
the pooled logits + (for N > 1) the Switch-style router balance loss, best
-val-AUC model selection. Only ``lora_*`` params and the head train.

With ``--synthetic`` (default) the run self-generates separable patch bags
so the recipe is executable without any checkpoint:

  python -m moc_tpu.cli.lora_finetune --lora_rank 4 --lora_experts 4 \
      --balance_coef 0.01 --epochs 4 --result_dir /tmp/moe_lora

Real patch bags: point ``--h5_dir`` at a CLAM ``h5_files`` directory of
patch *images* (``data.patches.PatchBagReader`` schema) with a labels CSV.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


from moc_tpu.cli.common import setup_runtime


def get_args(argv=None):
    p = argparse.ArgumentParser(description="CONCH-LoRA / MoE-LoRA fine-tuning")
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--lora_experts", type=int, default=1,
                   help=">1 enables mixture-of-LoRA with a per-token router")
    p.add_argument("--balance_coef", type=float, default=0.01,
                   help="router load-balance loss weight (MoE-LoRA only)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--queue_size", type=int, default=20,
                   help="train-time top-logit queue rows (ref 20)")
    p.add_argument("--eval_queue_size", type=int, default=10,
                   help="eval-time queue rows over softmaxed logits (ref 10)")
    p.add_argument("--minibatch", type=int, default=8)
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--result_dir", default="results/lora_finetune")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    # synthetic corpus (default) vs real patch-image bags
    p.add_argument("--synthetic", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--slides_per_class", type=int, default=6)
    p.add_argument("--val_per_class", type=int, default=3)
    p.add_argument("--patches_per_slide", type=int, default=32)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--patch_size", type=int, default=8)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--h5_dir", default=None,
                   help="CLAM h5_files dir of patch images (real-data mode)")
    p.add_argument("--labels_csv", default=None,
                   help="slide_id,label CSV for --h5_dir")
    return p.parse_args(argv)


def _synthetic_bags(args, rng, count_per_class):
    """Separable patch-image bags: class k brightens color channel k in a
    block of each patch (plus noise), so a LoRA-adapted tower can learn the
    distinction while the frozen base cannot have it memorized."""
    import numpy as np

    slides = []
    s = args.image_size
    for label in range(args.n_classes):
        for _ in range(count_per_class):
            imgs = rng.random((args.patches_per_slide, s, s, 3)).astype(np.float32)
            imgs[:, : s // 2, : s // 2, label % 3] += 1.0
            slides.append((imgs / 2.0, np.ones(args.patches_per_slide, bool),
                           label))
    rng.shuffle(slides)
    return slides


def _real_bags(args):
    import numpy as np
    import pandas as pd

    from moc_tpu.data.patches import PatchBagReader

    table = pd.read_csv(args.labels_csv, dtype={"slide_id": str})
    slides = []
    for _, row in table.iterrows():
        reader = PatchBagReader(os.path.join(args.h5_dir, f"{row.slide_id}.h5"),
                                image_size=args.image_size)
        chunks = [c for c, _ in reader.batches(64)]
        s = args.image_size
        imgs = (np.concatenate(chunks) if chunks
                else np.zeros((0, s, s, 3), np.float32))  # zero-patch slide
        # pad (never truncate) to a minibatch multiple: the trainer's valid
        # mask already handles pad patches, and truncation would silently
        # drop patches (or empty out slides smaller than one minibatch)
        n = len(imgs)
        n_pad = -n % args.minibatch if n else args.minibatch
        if n_pad:
            imgs = np.concatenate(
                [imgs, np.zeros((n_pad, *imgs.shape[1:]), imgs.dtype)])
        valid = np.arange(len(imgs)) < n
        slides.append((imgs, valid, int(row.label)))
    # stratified val split (the raw CSV is often label-sorted; taking a
    # prefix would hand eval a single class and crash roc_auc_score)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(slides))
    by_class: dict[int, list[int]] = {}
    for i in order:
        by_class.setdefault(slides[i][2], []).append(i)
    val_idx = {idx for members in by_class.values()
               for idx in members[: max(1, len(members) // 4)]}
    train = [slides[i] for i in range(len(slides)) if i not in val_idx]
    val = [slides[i] for i in sorted(val_idx)]
    return train, val


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)
    os.makedirs(args.result_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from moc_tpu.models.lora import lora_balance_loss
    from moc_tpu.nn.vit import VisionTransformer
    from moc_tpu.train.lora_finetune import LoraFinetuneConfig, run_lora_finetune

    class PatchClassifier(nn.Module):
        @nn.compact
        def __call__(self, images):
            tokens = VisionTransformer(
                image_size=args.image_size, patch_size=args.patch_size,
                dim=args.dim, num_layers=args.layers, num_heads=args.heads,
                lora_rank=args.lora_rank, lora_experts=args.lora_experts,
                name="tower",
            )(images)
            return nn.Dense(args.n_classes, name="head")(tokens[:, 0])

    tower = PatchClassifier()
    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        train = _synthetic_bags(args, rng, args.slides_per_class)
        val = _synthetic_bags(args, rng, args.val_per_class)
    else:
        if not (args.h5_dir and args.labels_csv):
            raise SystemExit("--h5_dir and --labels_csv required without --synthetic")
        train, val = _real_bags(args)

    params = tower.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((args.minibatch, args.image_size,
                                   args.image_size, 3)))

    moe = args.lora_experts > 1
    coef = args.balance_coef if moe else 0.0

    def encode(p, mb, vm=None):
        if coef > 0:
            out, inter = tower.apply(p, mb, mutable=["intermediates"])
            return out, lora_balance_loss(inter["intermediates"], patch_valid=vm)
        return tower.apply(p, mb)

    cfg = LoraFinetuneConfig(queue_size=args.queue_size,
                             eval_queue_size=args.eval_queue_size,
                             minibatch=args.minibatch,
                             learning_rate=args.lr, n_classes=args.n_classes,
                             balance_coef=coef)
    best_params, best_auc = run_lora_finetune(
        encode, params, train, val, cfg, epochs=args.epochs, log=print)

    from moc_tpu.utils.checkpoint import save_params

    tag = f"r{args.lora_rank}_e{args.lora_experts}"
    save_params(os.path.join(args.result_dir, f"lora_{tag}.msgpack"), best_params)
    payload = {"best_val_auc": float(best_auc), "lora_rank": args.lora_rank,
               "lora_experts": args.lora_experts, "balance_coef": coef,
               "epochs": args.epochs}
    out = os.path.join(args.result_dir, f"lora_{tag}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=4)
    print(f"best val auc: {best_auc:.4f} → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
