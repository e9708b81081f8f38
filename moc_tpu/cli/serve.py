"""Long-running MOC/MIL prediction daemon: new feature bags in, rows out.

The reference has no serving story at all — scoring new slides means
re-running the training script (``/root/reference/main_moc.py:462-520``,
one process per invocation, weights re-loaded and the model re-built every
time). This daemon keeps the compiled forward, the senet/MIL parameters,
and the zero-shot weight matrices resident and scores bags as they appear,
so per-slide latency is one padded forward (sub-millisecond on a v5e for
the masked exact path) instead of a process start + compile.

Two modes:

* ``--watch_dir DIR``: poll a CLAM-style feature directory (``h5_files/``
  and/or ``pt_files/``, or loose ``*.h5``/``*.pt`` files) and append one
  CSV row per new slide to ``--out``. Already-scored slide ids (present in
  ``--out`` from any earlier run) are skipped, so restarts are idempotent.
  ``--once`` drains the current backlog and exits (cron-friendly; also how
  the tests drive it).
* ``--from_stdin``: read one bag path (or slide id, resolved against
  ``--feature_dir``) per line and emit one JSON object per line on stdout —
  a pipe-friendly request/response loop.

Batching: backlog bags are scored in padded batches of ``--batch_size``
per bucket (one compiled program per bucket, cached across the process
lifetime); stdin lines are scored one at a time for latency.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

from moc_tpu.cli.common import add_perf_flags, perf_cfg_kwargs, setup_runtime


def get_args(argv=None):
    p = argparse.ArgumentParser(description="MOC slide prediction daemon")
    p.add_argument("--dataset", default="nsclc",
                   choices=["nsclc", "rcc", "ebrains12", "ebrains30"])
    p.add_argument("--model", default=None,
                   help="msgpack checkpoint: a MOC senet (best_model_*) or a "
                        "trained MIL head (with --model_kind mil); not "
                        "needed with --from_program")
    p.add_argument("--from_program", default=None, metavar="PATH",
                   help="serve an exported jax.export artifact "
                        "(cli.predict --export_program) instead of "
                        "--model + weights — no model code, weights, or "
                        "trace/compile at startup")
    p.add_argument("--model_kind", default="moc", choices=["moc", "mil"])
    p.add_argument("--model_type", default=None,
                   help="MIL head architecture (default: the checkpoint's "
                        "sidecar JSON)")
    p.add_argument("--model_size", default="conch")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--watch_dir", default=None,
                     help="feature dir to poll for new bags")
    src.add_argument("--from_stdin", action="store_true",
                     help="read bag paths / slide ids from stdin, emit JSONL")
    p.add_argument("--feature_dir", default=None,
                   help="base dir for resolving bare slide ids in stdin mode")
    p.add_argument("--out", default="predictions.csv",
                   help="CSV appended to in watch mode (header written once)")
    p.add_argument("--poll", type=float, default=2.0,
                   help="watch-mode poll interval seconds")
    p.add_argument("--warmup", default=None, metavar="N1,N2",
                   help="pre-compile the scoring program for these padded "
                        "bucket sizes at startup (e.g. 2048,4096) so first "
                        "requests never stall on a compile; with a warm "
                        "persistent cache this is just executable loading")
    p.add_argument("--warmup_dim", type=int, default=None,
                   help="feature dim for --warmup when it cannot be "
                        "inferred (inferred from --from_program metadata)")
    p.add_argument("--once", action="store_true",
                   help="watch mode: drain the backlog and exit")
    p.add_argument("--topj", type=int, default=400)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--storage_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="on-device bag dtype (see cli.predict; int8 also "
                        "quarters the per-request transfer — the latency "
                        "wall on tunnel/DCN-attached hosts)")
    p.add_argument("--weights_npz", default=None)
    p.add_argument("--weights_ext_npz", default=None)
    p.add_argument("--conch_checkpoint", default=None)
    p.add_argument("--tokenizer_file", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR")
    add_perf_flags(p)
    return p.parse_args(argv)


def _discover(root: str) -> dict[str, str]:
    """slide_id -> bag path for every readable bag under ``root`` (CLAM
    ``{h5_files,pt_files}`` layout or loose files; h5 wins on duplicates)."""
    found: dict[str, str] = {}
    for pattern in (os.path.join(root, "pt_files", "*.pt"),
                    os.path.join(root, "*.pt"),
                    os.path.join(root, "h5_files", "*.h5"),
                    os.path.join(root, "*.h5")):
        for path in glob.glob(pattern):
            found[os.path.splitext(os.path.basename(path))[0]] = path
    return found


def _read_bag_path(path: str):
    from moc_tpu.data.bags import read_bag_h5, read_bag_pt

    if path.endswith(".h5"):
        return read_bag_h5(path)
    if path.endswith(".pt"):
        return read_bag_pt(path)
    raise ValueError(f"unsupported bag file {path!r} (want .h5/.pt)")


class Server:
    """Resident predictor: parameters + compiled forwards, fed bags."""

    def __init__(self, args):
        import jax

        from moc_tpu.config import PRESETS

        self.args = args
        self.preset = PRESETS[args.dataset]
        self._min_pad = 0
        self._program = None
        if args.from_program:
            import jax.numpy as jnp

            from moc_tpu.utils.export import load_serving_program

            self._program = load_serving_program(args.from_program)
            meta = self._program.meta
            if meta["n_classes"] != self.preset.n_classes:
                raise SystemExit(
                    f"program was exported for {meta['n_classes']} classes "
                    f"(dataset {meta.get('dataset')!r}); --dataset "
                    f"{args.dataset} has {self.preset.n_classes}")
            if args.storage_dtype not in ("float32", meta["dtype"]):
                # same rejection as cli.predict: the tier is baked into the
                # exported program's input signature
                raise SystemExit(
                    f"program was exported at storage dtype {meta['dtype']}; "
                    f"--storage_dtype {args.storage_dtype} cannot apply")
            self.dtype = jnp.dtype(meta["dtype"])
            self.temperature = meta["temperature"]
            self._jit_logits = self._program.batch_logits
            self._min_pad = meta["min_pad"]
            args.batch_size = meta["batch_size"]  # baked into the program
            self._make_template = None
            return
        if not args.model:
            raise SystemExit("--model is required (or serve an artifact "
                             "with --from_program)")
        from moc_tpu.cli.predict import (_storage_dtype, build_predictor,
                                         resolve_model_config)

        resolve_model_config(args)
        self.dtype = _storage_dtype(args)  # validate the tier before compile
        batch_logits, self._make_template, self.temperature = build_predictor(
            args, self.preset)
        self._jit_logits = jax.jit(batch_logits)
        self._params = None  # loaded lazily: the MIL template needs a bag

    def _ensure_params(self, first_bag):
        if self._program is not None:
            return None  # baked into the exported program
        if self._params is None:
            from moc_tpu.utils.checkpoint import load_params

            self._params = load_params(self.args.model,
                                       self._make_template(first_bag))
        return self._params

    def warmup(self, pads, dim=None):
        """Compile (or cache-load) the scoring program for each padded
        bucket size before any real request arrives. A zero bag with
        exactly ``n`` rows lands in bucket ``n``; its rows double as the
        lazy-params shape template, so this works for every model kind."""
        from moc_tpu.data.bags import Bag

        import numpy as np

        if dim is None and self._program is not None:
            dim = self._program.meta["feature_dim"]
        if dim is None:
            raise SystemExit("--warmup needs --warmup_dim to size the dummy "
                             "bags (only --from_program metadata carries it)")
        for n in sorted(set(int(p) for p in pads)):
            t0 = time.time()
            bag = Bag(slide_id="__warmup__", label=-1, coords=None,
                      features=np.zeros((n, dim), np.float32))
            self.score([bag])
            print(f"warmup n={n}: {time.time() - t0:.1f}s", file=sys.stderr)

    def score(self, bags, batch_size=None):
        """Bags → result rows (see ``cli.predict.score_bags``)."""
        from moc_tpu.cli.predict import score_bags

        if not bags:
            return []
        if self._program is not None:
            batch_size = self.args.batch_size  # shape baked into the program
        params = self._ensure_params(bags[0])
        return score_bags(self._jit_logits, params, bags,
                          batch_size=batch_size or self.args.batch_size,
                          n_classes=self.preset.n_classes,
                          temperature=self.temperature, dtype=self.dtype,
                          min_pad=self._min_pad)


def serve_stream(server: Server, lines, resolve_dir: str | None = None):
    """stdin protocol: yield one result dict per input line (latency mode:
    batch of one). Unreadable inputs yield an ``error`` object instead of
    killing the daemon. Bare slide ids resolve against a cached directory
    index, re-scanned only when an id is missing (new bags show up without
    paying an O(dir) glob on every request)."""
    index: dict[str, str] = {}
    for raw in lines:
        path = raw.strip()
        if not path:
            continue
        try:
            if not os.path.exists(path) and resolve_dir:
                if path not in index:
                    index = _discover(resolve_dir)
                if path in index:
                    path = index[path]
            bag = _read_bag_path(path)
            yield server.score([bag], batch_size=1)[0]
        except Exception as e:  # keep serving: report the bad request
            yield {"slide_id": os.path.splitext(os.path.basename(path))[0],
                   "error": str(e)}


def _parse_warmup(spec: str) -> list[int]:
    """``--warmup`` list parse, tolerant of stray commas/whitespace from
    shell templating; a usage error, not a traceback, on junk."""
    try:
        pads = [int(x) for x in spec.replace(",", " ").split()]
    except ValueError:
        raise SystemExit(f"--warmup wants a comma-separated list of padded "
                         f"sizes (e.g. 2048,4096); got {spec!r}")
    if not pads:
        raise SystemExit("--warmup got an empty pad list")
    return pads


def _shard_owns(slide_id: str, shard: tuple[int, int] | None) -> bool:
    """Stable ownership of a slide id on an (index, count) process shard —
    content-hashed (not Python ``hash``, which is salted per process) so
    every daemon in a multi-process pod claims a disjoint subset."""
    if shard is None:
        return True
    import hashlib

    index, count = shard
    digest = hashlib.blake2b(slide_id.encode(), digest_size=8).digest()
    return int.from_bytes(digest, "big") % count == index


MAX_READ_RETRIES = 3


def watch_once(server: Server, watch_dir: str, out_csv: str,
               seen: set[str], shard: tuple[int, int] | None = None,
               failures: dict[str, int] | None = None) -> int:
    """Score every not-yet-seen bag under ``watch_dir``; append to the CSV.
    Returns the number of new rows.

    A discovered file can still be MID-COPY (writers that aren't atomic) —
    an unreadable bag is retried on later polls and only written off as
    corrupt after ``MAX_READ_RETRIES`` consecutive failures (marking it
    ``seen`` on the first failure silently dropped every slowly-rsynced
    bag forever). Pass a persistent ``failures`` dict to carry the counts
    across polls.

    Scoring failures are isolated the same way: a readable bag the model
    rejects (wrong feature dim, truncated arrays) must not kill the daemon
    or poison the batch its neighbors ride in — the batch falls back to
    per-bag scoring, the offender accrues a failure count (transient device
    errors heal on a later poll; deterministic mismatches are written off
    after ``MAX_READ_RETRIES``), and the rest of the backlog still lands in
    the CSV."""
    import pandas as pd

    backlog = {sid: p for sid, p in _discover(watch_dir).items()
               if sid not in seen and _shard_owns(sid, shard)}
    if not backlog:
        return 0
    if failures is None:
        failures = {}
    bags, scored_ids = [], []
    for sid, path in sorted(backlog.items()):
        try:
            bags.append(_read_bag_path(path))
            scored_ids.append(sid)
        except Exception as e:
            failures[sid] = failures.get(sid, 0) + 1
            if failures[sid] >= MAX_READ_RETRIES:
                print(f"skipping {path} after {failures[sid]} failed reads: "
                      f"{e}", file=sys.stderr)
                seen.add(sid)
            else:
                print(f"cannot read {path} yet (attempt {failures[sid]}/"
                      f"{MAX_READ_RETRIES}): {e}; will retry",
                      file=sys.stderr)
    try:
        rows = server.score(bags)
        for sid in scored_ids:  # clear counts only on a successful SCORE —
            failures.pop(sid, None)  # a clean read alone must not reset them
    except Exception:
        rows = []
        ok_ids = []
        for bag, sid in zip(bags, scored_ids):
            try:
                rows.extend(server.score([bag]))
                ok_ids.append(sid)
                failures.pop(sid, None)
            except Exception as e:
                failures[sid] = failures.get(sid, 0) + 1
                if failures[sid] >= MAX_READ_RETRIES:
                    print(f"skipping {sid} after {failures[sid]} failed "
                          f"scores: {e}", file=sys.stderr)
                    seen.add(sid)
                else:
                    print(f"cannot score {sid} (attempt {failures[sid]}/"
                          f"{MAX_READ_RETRIES}): {e}; will retry",
                          file=sys.stderr)
        scored_ids = ok_ids
    if rows:
        df = pd.DataFrame(rows)
        header = not os.path.exists(out_csv)
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        df.to_csv(out_csv, mode="a", header=header, index=False)
    seen.update(scored_ids)
    return len(rows)


def _seen_from_csv(out_csv: str) -> set[str]:
    if not os.path.exists(out_csv):
        return set()
    import pandas as pd

    try:
        return set(pd.read_csv(out_csv, dtype=str)["slide_id"])
    except Exception:
        return set()


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)
    server = Server(args)
    if args.warmup:
        server.warmup(_parse_warmup(args.warmup), dim=args.warmup_dim)

    if args.from_stdin:
        for result in serve_stream(server, sys.stdin, args.feature_dir):
            print(json.dumps(result), flush=True)
        return 0

    import jax

    shard = None
    if jax.process_count() > 1:
        # multi-process pod: each daemon owns a hash-disjoint id subset and
        # appends to its own CSV (concatenate to merge)
        pid, n = jax.process_index(), jax.process_count()
        shard = (pid, n)
        root, ext = os.path.splitext(args.out)
        args.out = f"{root}.proc{pid}{ext}"
        print(f"process {pid}/{n}: watching shard → {args.out}",
              file=sys.stderr)
    seen = _seen_from_csv(args.out)
    if seen:
        print(f"resuming: {len(seen)} slides already in {args.out}",
              file=sys.stderr)
    failures: dict[str, int] = {}
    while True:
        n = watch_once(server, args.watch_dir, args.out, seen, shard,
                       failures=failures)
        if n:
            print(f"scored {n} new slides -> {args.out}", file=sys.stderr)
        if args.once:
            return 0
        time.sleep(args.poll)


if __name__ == "__main__":
    sys.exit(main())
