"""Standalone MOC inference: trained senet + weight matrices → predictions.

The reference has no prediction entry point — scoring new slides means
re-running the training script's eval loops (``main_moc.py:462-520``). This
CLI is the serving path: load a ``best_model_*.msgpack`` senet checkpoint
(written by ``cli.main_moc`` / ``cli.sweep``), the zero-shot weight
matrices (cached ``.npz`` or built from a CONCH checkpoint + vendored
banks), stream a directory of CLAM bags through the batched jitted forward,
and write per-slide probabilities:

  python -m moc_tpu.cli.predict --dataset nsclc \
      --model results/1_shot/best_model_shot_1_fold_0.msgpack \
      --feature_dir /data/nsclc/merge_features_conch \
      --weights_npz cache/weights_nsclc_conch.npz \
      --weights_ext_npz cache/weights_nsclc_ext_conch.npz \
      --out predictions.csv

``--csv`` defaults to the vendored slide table; point it at any
``slide_id[,label]`` CSV for new cohorts (missing labels → metrics skipped).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

from moc_tpu.cli.common import (add_perf_flags, perf_cfg_kwargs,
                                replicate_to_mesh, round_up_to_mesh,
                                serving_mesh, setup_runtime)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="MOC slide prediction")
    p.add_argument("--dataset", default="nsclc",
                   choices=["nsclc", "rcc", "ebrains12", "ebrains30"])
    p.add_argument("--model", default=None,
                   help="msgpack checkpoint: a MOC senet (best_model_*) or a "
                        "trained MIL head (with --model_kind mil); not "
                        "needed with --from_program")
    p.add_argument("--model_kind", default="moc", choices=["moc", "mil"],
                   help="moc = senet + zero-shot weight matrices; mil = a "
                        "baseline MIL head from train_mil (no weights needed)")
    p.add_argument("--model_type", default=None,
                   help="MIL head architecture for --model_kind mil "
                        "(default: read from the checkpoint's sidecar JSON "
                        "— train_mil writes the model config next to the "
                        "msgpack)")
    p.add_argument("--model_size", default="conch")
    p.add_argument("--feature_dir", required=True,
                   help="CLAM feature dir ({h5_files,pt_files})")
    p.add_argument("--csv", default=None,
                   help="slide table (default: the vendored dataset CSV); "
                        "any CSV with slide_id[,label] columns works")
    p.add_argument("--out", default="predictions.csv")
    p.add_argument("--topj", type=int, default=400)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each scoring batch over ALL visible devices "
                        "(mesh 'data' axis) — cohort-scale throughput on a "
                        "pod; batch_size is rounded up to a device-count "
                        "multiple. The reference scores on one GPU only")
    p.add_argument("--storage_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="on-device dtype of the feature bags (serving tier): "
                        "bfloat16 halves HBM residency, host->device bytes, "
                        "and the eval wall's dominant feature read (measured "
                        "1.41x on v5e at 16k patches); int8 quarters them "
                        "and scores W8A8 on the MXU's native int8 path "
                        "(per-row dynamic scales). Quantizes the inputs — "
                        "same approximation class as --score_dtype bfloat16")
    p.add_argument("--export_program", default=None, metavar="PATH",
                   help="export the scoring program (params + weight "
                        "matrices baked in) as a jax.export StableHLO "
                        "artifact and exit — deploy/serve it with "
                        "--from_program / cli.serve --from_program, no "
                        "model code or checkpoints needed (utils.export)")
    p.add_argument("--export_min_pad", type=int, default=1024,
                   help="padded-patch floor baked into the exported "
                        "program's symbolic shape (one artifact serves "
                        "every bucket size >= this)")
    p.add_argument("--from_program", default=None, metavar="PATH",
                   help="score from an exported program artifact instead "
                        "of --model + weights (batch_size/dtype/temperature "
                        "come from the artifact)")
    # weight matrices: cached .npz pair, or built from a CONCH checkpoint
    p.add_argument("--weights_npz", default=None)
    p.add_argument("--weights_ext_npz", default=None)
    p.add_argument("--conch_checkpoint", default=None)
    p.add_argument("--tokenizer_file", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    add_perf_flags(p)
    return p.parse_args(argv)


def _storage_dtype(args):
    """Resolve --storage_dtype, rejecting tiers the model kind can't score.

    MIL heads consume raw feature rows (attention nets, Nystrom towers) with
    no scaled-matmul formulation — int8 bags would need a full dequantized
    copy, defeating the tier; bf16/f32 flow through them natively.
    """
    import jax.numpy as jnp

    if args.storage_dtype == "int8":
        if getattr(args, "model_kind", "moc") == "mil":
            raise SystemExit("--storage_dtype int8 is a MOC serving tier; "
                             "MIL heads take float bags (use bfloat16)")
        return jnp.int8
    return jnp.bfloat16 if args.storage_dtype == "bfloat16" else jnp.float32


def resolve_model_config(args) -> None:
    """Fill ``--model_type``/``--model_size`` from the checkpoint's sidecar
    JSON when the user didn't pass them (``train_mil`` writes the model
    config beside every ``.msgpack``). No-op for the MOC senet kind."""
    if getattr(args, "model_kind", "moc") != "mil":
        return
    if args.model_type is not None:
        return
    model = getattr(args, "model", None) or getattr(args, "model_msgpack", None)
    sidecar = None
    if model and model.endswith(".msgpack"):
        cand = model[: -len(".msgpack")] + ".json"
        if os.path.exists(cand):
            import json

            with open(cand) as f:
                sidecar = json.load(f)
    if sidecar and "model_type" in sidecar:
        if sidecar["model_type"] == "vila":
            raise SystemExit(
                "this checkpoint is a ViLa model (dual-scale bags + prompt "
                "constants) — serve it via train.vila.evaluate_vila, not "
                "the single-scale predict path")
        args.model_type = sidecar["model_type"]
        if sidecar.get("model_size"):
            args.model_size = sidecar["model_size"]
        print(f"model config from sidecar {os.path.basename(cand)}: "
              f"{args.model_type} ({args.model_size})", file=sys.stderr)
        return
    raise SystemExit(
        "--model_kind mil needs --model_type (no sidecar JSON with a "
        "model_type field found next to the checkpoint)")


def _load_weights(args, preset):
    import numpy as np

    if args.weights_npz and args.weights_ext_npz:
        return (np.load(args.weights_npz)["weights"],
                np.load(args.weights_ext_npz)["weights"])
    if not args.conch_checkpoint:
        raise SystemExit("need --weights_npz/--weights_ext_npz or --conch_checkpoint")
    from moc_tpu.cli.main_moc import _build_weights

    ns = argparse.Namespace(
        conch_checkpoint=args.conch_checkpoint,
        tokenizer_file=args.tokenizer_file,
        prompt_root=__import__("moc_tpu.config", fromlist=["x"]).DEFAULT_PROMPT_ROOT,
        weights_cache_dir=os.path.join(os.path.dirname(args.out) or ".",
                                       "classifier_weights"),
        load_weight=True,
    )
    return _build_weights(ns, preset)


def build_predictor(args, preset, mesh=None):
    """``(batch_logits, make_template, temperature)`` for the configured
    model kind — the forward shared by ``cli.predict`` (batch scoring) and
    ``cli.serve`` (long-running daemon). ``batch_logits(params, BagBatch)``
    returns ``[B, C]`` logits; ``make_template(first_bag)`` a parameter
    template for ``load_params``. With ``mesh``, the closed-over weight
    matrices are replicated over it (batch inputs arrive sharded on the
    ``data`` axis — see ``score_bags``)."""
    import jax
    import jax.numpy as jnp

    from moc_tpu.moc import MOCConfig, init_senet, make_episode_fns

    if args.model_kind == "mil":
        # baseline MIL head: logits come straight from the trained model
        # (ref eval_utils.eval); temperature 1 (no CONCH logit scale)
        from moc_tpu.train import MilTrainConfig, build_model

        mil_cfg = MilTrainConfig(model_type=args.model_type,
                                 model_size=args.model_size,
                                 n_classes=preset.n_classes)
        _, forward, init_fn = build_model(mil_cfg)
        temperature = 1.0

        def batch_logits(params, batch):
            return jax.vmap(lambda f, v: forward(params, f, v, None)[0])(
                batch.features, batch.mask)

        def make_template(first_bag):
            return init_fn(jax.random.PRNGKey(0),
                           jnp.zeros_like(jnp.asarray(first_bag.features)),
                           jnp.ones((first_bag.features.shape[0],), bool))
    else:
        w, w_ext = _load_weights(args, preset)
        cfg = MOCConfig(n_classes=preset.n_classes,
                        n_ext_classes=preset.n_ext_classes,
                        topj=args.topj, topk=args.topk, feature_dim=w.shape[0],
                        **perf_cfg_kwargs(args))
        _, eval_batch, _ = make_episode_fns(cfg)
        wj = replicate_to_mesh(jnp.asarray(w), mesh)
        wej = replicate_to_mesh(jnp.asarray(w_ext), mesh)
        temperature = cfg.temperature

        def batch_logits(params, batch):
            return eval_batch(params, batch, wj, wej)

        def make_template(first_bag):
            return init_senet(jax.random.PRNGKey(0), cfg)[1]

    return batch_logits, make_template, temperature


def score_bags(jit_logits, params, bags, *, batch_size, n_classes,
               temperature, dtype, with_labels=False, mesh=None,
               min_pad=0):
    """Bucketize + pad + score a list of bags → per-slide result rows
    (shared by ``cli.predict`` and ``cli.serve``). With ``mesh``, each
    padded batch is sharded over the ``data`` axis so every device scores
    ``batch_size / n_devices`` slides (``batch_size`` must divide; the CLI
    rounds it up). ``min_pad`` raises every bucket's padded length to at
    least that (exported programs bake in a symbolic-shape floor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moc_tpu.data.batching import bucketize, pack_bags
    from moc_tpu.metrics import softmax_probs

    if mesh is not None and batch_size % mesh.size:
        raise ValueError(f"batch_size {batch_size} does not divide over the "
                         f"{mesh.size}-device data mesh")

    def place(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*(["data"] + [None] * (x.ndim - 1))))),
            batch)

    # clamp each bucket's padded length to min_pad BEFORE grouping: buckets
    # that coincide after the raise merge into one group, so slides below
    # the exported-program floor pack tightly instead of running extra
    # part-filled batches at the same padded shape
    buckets: dict[int, list] = {}
    for n_pad, group in bucketize(bags).items():
        buckets.setdefault(max(n_pad, min_pad), []).extend(group)
    rows = []
    for n_pad, group in sorted(buckets.items()):
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            real = len(chunk)
            while len(chunk) < batch_size:
                chunk = chunk + [dataclasses.replace(chunk[0], label=-1)]
            batch = place(pack_bags(chunk, n_pad=n_pad, dtype=dtype,
                                    device_put=mesh is None))
            logits = np.asarray(jit_logits(params, batch))
            probs = np.asarray(softmax_probs(jnp.asarray(logits), temperature))
            for b in range(real):
                row = {"slide_id": chunk[b].slide_id,
                       "pred": int(np.argmax(logits[b]))}
                if with_labels:
                    row["label"] = int(chunk[b].label)
                for c in range(n_classes):
                    row[f"prob_{c}"] = float(probs[b, c])
                rows.append(row)
    return rows


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)

    import jax
    import numpy as np
    import pandas as pd

    from moc_tpu.config import PRESETS
    from moc_tpu.data import BagLoader, SlideTable
    from moc_tpu.metrics import roc_auc_host
    from moc_tpu.utils.checkpoint import load_params

    preset = PRESETS[args.dataset]
    csv_path = args.csv or preset.csv_path("/nonexistent")  # vendored fallback
    frame = pd.read_csv(csv_path, dtype=str)
    labeled = "label" in frame.columns and frame["label"].isin(preset.label_dict).all()
    if labeled:
        table = SlideTable.from_frame(frame, preset.label_dict)
    else:
        frame = frame.copy()
        frame["label"] = "?"
        table = SlideTable.from_frame(frame, {"?": -1})

    import jax.numpy as jnp

    program = None
    if args.from_program:
        if args.data_parallel:
            raise SystemExit("--from_program artifacts are compiled "
                             "single-device; drop --data_parallel (export "
                             "is cheap — score live for mesh serving)")
        from moc_tpu.utils.export import load_serving_program

        program = load_serving_program(args.from_program)
        if program.meta["n_classes"] != preset.n_classes:
            raise SystemExit(
                f"program was exported for {program.meta['n_classes']} "
                f"classes (dataset {program.meta.get('dataset')!r}); "
                f"--dataset {args.dataset} has {preset.n_classes}")
        mesh = None
        batch_size = program.meta["batch_size"]
        temperature = program.meta["temperature"]
        batch_logits, make_template = program.batch_logits, None
        if args.batch_size != batch_size:
            print(f"batch_size {batch_size} is baked into the program; "
                  f"ignoring --batch_size {args.batch_size}", file=sys.stderr)
    else:
        if not args.model:
            raise SystemExit("--model is required (or score from an "
                             "artifact with --from_program)")
        resolve_model_config(args)
        mesh = serving_mesh() if args.data_parallel else None
        batch_size = round_up_to_mesh(args.batch_size, mesh)
        batch_logits, make_template, temperature = build_predictor(
            args, preset, mesh=mesh)

    if not len(table):
        raise SystemExit("the slide CSV parsed to zero rows — check its "
                         "slide_id/label columns and the label dict")
    loader = BagLoader(table, args.feature_dir)
    shard_ids = None
    if jax.process_count() > 1:
        # multi-process pod (parallel.runtime): disjoint slide shard per
        # process, per-process CSV (merge = concat; metrics print per shard)
        pid, n = jax.process_index(), jax.process_count()
        if args.export_program:
            raise SystemExit("--export_program writes one artifact; run it "
                             "single-process")
        shard_ids = list(table.slide_ids)[pid::n]
        root, ext = os.path.splitext(args.out)
        args.out = f"{root}.proc{pid}{ext}"
        print(f"process {pid}/{n}: scoring {len(shard_ids)} slides → "
              f"{args.out}", file=sys.stderr)
        if not shard_ids:  # more processes than slides: empty shard
            # same schema as non-empty shards so the documented
            # concat-merge stays column-aligned
            cols = ["slide_id", "pred"]
            if labeled:
                cols.append("label")
            cols += [f"prob_{c}" for c in range(preset.n_classes)]
            pd.DataFrame(columns=cols).to_csv(args.out, index=False)
            return 0
    try:
        bags = loader.read_all(shard_ids)
    except (FileNotFoundError, OSError) as e:
        raise SystemExit(
            f"could not read feature bags under {args.feature_dir!r}: {e} — "
            f"check --feature_dir matches the CSV's slide_id column "
            f"(expected <slide_id>.h5/.pt files)") from e
    if not bags:
        raise SystemExit(
            f"no feature bags found for {len(table)} slide ids under "
            f"{args.feature_dir!r} — check --feature_dir matches the CSV's "
            f"slide_id column (expected <slide_id>.h5/.pt files)")
    if program is not None:
        params, jit_logits = None, batch_logits  # already compiled+baked
        bag_dtype = jnp.dtype(program.meta["dtype"])
        if args.storage_dtype not in ("float32", bag_dtype.name):
            raise SystemExit(f"program was exported at storage dtype "
                             f"{bag_dtype.name}; --storage_dtype "
                             f"{args.storage_dtype} cannot apply")
        min_pad = program.meta["min_pad"]
    else:
        params = replicate_to_mesh(load_params(args.model,
                                               make_template(bags[0])), mesh)
        jit_logits = jax.jit(batch_logits)
        bag_dtype = _storage_dtype(args)
        min_pad = 0

    if args.export_program:
        from moc_tpu.utils.export import save_serving_program

        if program is not None:
            raise SystemExit("--export_program needs the live model, not "
                             "--from_program")
        if mesh is not None:
            raise SystemExit("export is single-device; drop --data_parallel")
        try:
            meta = save_serving_program(
                args.export_program, batch_logits, params,
                batch_size=batch_size,
                feature_dim=bags[0].features.shape[1],
                min_pad=args.export_min_pad, dtype=bag_dtype,
                meta=dict(temperature=temperature,
                          n_classes=preset.n_classes, dataset=args.dataset,
                          model_kind=args.model_kind, topj=args.topj,
                          topk=args.topk))
        except ValueError as e:
            raise SystemExit(str(e)) from e
        print(f"exported serving program → {args.export_program} "
              f"(batch {meta['batch_size']}, n >= {meta['min_pad']}, "
              f"{meta['dtype']}, platforms {meta['platforms']})")
        return 0

    rows = score_bags(jit_logits, params, bags, batch_size=batch_size,
                      n_classes=preset.n_classes, temperature=temperature,
                      dtype=bag_dtype, with_labels=labeled, mesh=mesh,
                      min_pad=min_pad)

    out = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out.to_csv(args.out, index=False)
    print(f"{len(out)} slides → {args.out}")
    if labeled:
        labels = out["label"].to_numpy()
        probs = out[[f"prob_{c}" for c in range(preset.n_classes)]].to_numpy()
        acc = float((out["pred"].to_numpy() == labels).mean())
        auc = roc_auc_host(probs, labels)
        print(f"acc={acc:.4f} auc={auc:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
