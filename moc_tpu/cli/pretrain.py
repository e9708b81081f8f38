"""Distributed masked-token pretraining: the torchscale stack as an entry
point.

The reference vendors a full distributed encoder stack (torchscale: MoE,
FSDP hooks, seq-parallel dilated attention) but ships NO way to launch it —
it exists only as the frozen MUSK backbone's substrate
(``/root/reference/models/musk/torchscale/``). This CLI makes the rebuilt
stack (``train/pretrain.py``) launchable: a masked-token objective over a
deepnorm/subln encoder, sharded over a ``data × seq × tensor × expert``
mesh, with orbax checkpoint/resume (preemption-safe; the reference has no
resume at all, SURVEY §5.3).

  # 8-chip dp×tp on one host
  python -m moc_tpu.cli.pretrain --steps 1000 --batch 32 --seq_len 512 \
      --layers 12 --embed_dim 768 --ffn_dim 3072 --heads 12 \
      --mesh data=4,tensor=2 --ckpt_dir ckpts/run0

  # MoE every 2nd layer, experts sharded over the mesh
  python -m moc_tpu.cli.pretrain --steps 1000 --moe_experts 8 --moe_freq 2 \
      --mesh data=2,expert=4

  # multi-host pod: one process per host via scripts/pod_launch.sh
  # (MOC_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID env); each process
  # feeds its own batch rows, assembled into the global array here

Data: a deterministic synthetic token stream by default (replay-exact on
resume — ``data_fn`` is a pure function of the step index), or windows of
a real token corpus via ``--corpus tokens.npy`` (1-D int array).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Distributed encoder pretraining")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=32,
                   help="GLOBAL batch (split over the data axis and, on "
                        "pods, over processes)")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--vocab", type=int, default=1024,
                   help="vocab size; the last id is reserved as [MASK]")
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--ffn_dim", type=int, default=1024)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "bfloat16", "float32"],
                   help="matmul compute dtype (params stay f32 master "
                        "weights; measured 1.26-1.27x step speed on v5e)")
    p.add_argument("--deepnorm", action="store_true",
                   help="deepnorm residual scaling (torchscale consistency "
                        "rules apply: post-LN, no subln)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help=">0 swaps FFNs for a GShard MoE every --moe_freq "
                        "layers (experts shard over the mesh 'expert' axis)")
    p.add_argument("--moe_freq", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--mesh", default="data=-1",
                   help="mesh axis sizes, e.g. 'data=4,tensor=2', "
                        "'data=2,expert=4', or 'data=2,pipe=4' (GPipe "
                        "pipeline stages); -1 absorbs remaining devices")
    p.add_argument("--microbatches", type=int, default=4,
                   help="GPipe microbatches per step (pipe meshes only); "
                        "must divide the per-data-shard batch")
    p.add_argument("--param_dtype", default=None,
                   choices=[None, "bfloat16"],
                   help="parameter STORAGE dtype: bfloat16 halves fwd/bwd "
                        "weight HBM reads; f32 master weights live in the "
                        "optimizer state (Adam in f32, no loss scaling "
                        "needed)")
    p.add_argument("--corpus", default=None,
                   help="1-D .npy int token array; batches are "
                        "deterministically sampled windows (default: "
                        "synthetic uniform tokens)")
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax checkpoint dir; re-invocation resumes from "
                        "the latest step")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR")
    return p.parse_args(argv)


def parse_mesh_arg(spec: str) -> dict[str, int]:
    """``"data=4,tensor=2"`` → ``{"data": 4, "tensor": 2}``."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition("=")
        if not size:
            raise ValueError(f"mesh axis {part!r} needs NAME=SIZE")
        out[name.strip()] = int(size)
    return out


def make_data_fn(args):
    """Deterministic ``data_fn(step) -> (token_ids [B, L], mask_pos [B, L])``
    (pure function of the step index → resume replays the exact batch
    sequence, the ``run_pretrain`` contract)."""
    b, l, vocab = args.batch, args.seq_len, args.vocab
    corpus = None
    if args.corpus:
        corpus = np.load(args.corpus).astype(np.int32).ravel()
        if corpus.size <= l:
            raise SystemExit(f"--corpus has {corpus.size} tokens; need more "
                             f"than --seq_len {l}")
        if corpus.max() >= vocab - 1:
            raise SystemExit(f"--corpus max id {corpus.max()} collides with "
                             f"[MASK]=vocab-1 ({vocab - 1}); raise --vocab")

    def data_fn(step: int):
        rng = np.random.default_rng(np.uint64(args.seed) * np.uint64(1 << 32)
                                    + np.uint64(step))
        if corpus is None:
            ids = rng.integers(0, vocab - 1, size=(b, l), dtype=np.int32)
        else:
            starts = rng.integers(0, corpus.size - l, size=b)
            ids = np.stack([corpus[s : s + l] for s in starts])
        mask = rng.random((b, l)) < args.mask_prob
        return ids, mask

    return data_fn


def log_factory(args):
    """Per-step logger thinned to every ``--log_every`` steps."""
    seen = {"n": 0}

    def log(msg: str) -> None:
        if not msg.startswith("step "):
            print(msg, file=sys.stderr)
            return
        if seen["n"] % args.log_every == 0:
            print(msg, file=sys.stderr)
        seen["n"] += 1

    return log


def main(argv=None) -> int:
    args = get_args(argv)
    from moc_tpu.cli.common import setup_runtime

    setup_runtime(args)

    import jax

    from moc_tpu.nn.encoder import EncoderConfig
    from moc_tpu.parallel.mesh import make_mesh
    from moc_tpu.parallel.moe import MoEConfig
    from moc_tpu.train.pretrain import (PretrainConfig, pretrain_data_spec,
                                        run_pretrain)

    mesh = make_mesh(parse_mesh_arg(args.mesh))
    enc = EncoderConfig(
        embed_dim=args.embed_dim, ffn_dim=args.ffn_dim, layers=args.layers,
        heads=args.heads, deepnorm=args.deepnorm,
        compute_dtype=args.compute_dtype,
        moe_freq=args.moe_freq if args.moe_experts else 0,
        moe=MoEConfig(n_experts=max(args.moe_experts, 1)))
    cfg = PretrainConfig(vocab_size=args.vocab, max_len=args.seq_len,
                         mask_prob=args.mask_prob, encoder=enc,
                         learning_rate=args.lr, param_dtype=args.param_dtype)

    data_fn = make_data_fn(args)
    nproc = jax.process_count()
    if mesh.shape.get("pipe", 1) > 1:
        # GPipe route: layer stack over pipeline stages, microbatched
        from moc_tpu.train.pretrain_pipe import run_pipe_pretrain

        if nproc > 1:
            raise SystemExit("--mesh pipe=N is single-process for now; use "
                             "data/tensor/expert axes on pods")
        if args.param_dtype:
            raise SystemExit("--param_dtype is not yet plumbed through the "
                             "pipeline trainer; drop one of the flags")
        print(f"mesh {dict(mesh.shape)} · GPipe x{mesh.shape['pipe']} · "
              f"{args.microbatches} microbatches", file=sys.stderr)
        _, _, losses = run_pipe_pretrain(
            cfg, mesh, data_fn, total_steps=args.steps,
            num_microbatches=args.microbatches, ckpt_dir=args.ckpt_dir,
            ckpt_every=args.ckpt_every, seed=args.seed, log=log_factory(args))
        if losses:
            print(f"final loss {losses[-1]:.4f} over {len(losses)} steps")
        else:
            print("nothing to do (already at --steps; checkpoint is current)")
        return 0
    if nproc > 1:
        # every process generates the same global batch deterministically,
        # keeps its contiguous row block, and the blocks are assembled into
        # ONE global array laid out as the train step's in_sharding
        from moc_tpu.parallel.runtime import host_local_to_global

        if args.batch % nproc:
            raise SystemExit(f"--batch {args.batch} must divide over "
                             f"{nproc} processes")
        spec = pretrain_data_spec(mesh)
        rows = args.batch // nproc
        lo = jax.process_index() * rows
        base_fn = data_fn

        def data_fn(step):  # noqa: F811 — multi-process wrapper
            ids, mask = base_fn(step)
            return (host_local_to_global(ids[lo : lo + rows], mesh, spec),
                    host_local_to_global(mask[lo : lo + rows], mesh, spec))

    print(f"mesh {dict(mesh.shape)} · {jax.device_count()} devices · "
          f"{nproc} process(es)", file=sys.stderr)
    _, _, losses = run_pretrain(
        cfg, mesh, data_fn, total_steps=args.steps, ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every, seed=args.seed, log=log_factory(args))
    if losses:
        print(f"final loss {losses[-1]:.4f} over {len(losses)} steps")
    else:
        print("nothing to do (already at --steps; checkpoint is current)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
