"""Episode sweep CLI: every (fold, shot) on one chip/process.

The reference fans one process per (fold, shot) across GPUs via bash
(``/root/reference/scripts/moc_train.sh:23-79``). Here the default is the
**fused sweep**: all folds of a shot are stacked, padded to common shapes,
and trained as ONE jitted/vmapped XLA program (``moc_tpu.moc.sweep``), with
episodes sharded over the mesh ``data`` axis when more than one device is
visible. Episodes too large to materialize in HBM fall back to the streaming
per-episode path (``--mode stream`` forces it); both paths produce identical
results (same RNG derivation, tested) and the same reference-schema result
JSONs + ``summary_{shot}.csv``.

  python -m moc_tpu.cli.sweep --dataset synthetic --shots 1 2 --folds 0 1 \
      --topj 64 --num_epochs 5 --result_dir /tmp/sweep_out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from moc_tpu.cli.common import add_perf_flags, perf_cfg_kwargs, setup_runtime


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
    from moc_tpu.config import DEFAULT_PROMPT_ROOT

    p.add_argument("--data_root", default="data")
    p.add_argument("--prompt_root", default=DEFAULT_PROMPT_ROOT,
                   help="prompt-bank dir (default: the vendored banks)")
    p.add_argument("--conch_checkpoint", default="models/conch_checkpoint.bin")
    p.add_argument("--tokenizer_file", default=None)
    p.add_argument("--weights_cache_dir", default="models/classifier_weights")
    p.add_argument("--load_weight", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--check_zeroshot", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic_classes", type=int, default=2,
                   help="class count for --dataset synthetic")
    p.add_argument("--synthetic_min_patches", type=int, default=500,
                   help="synthetic-corpus bag size range (the bench protocol "
                        "uses 1500-4000 to mirror real feature bags)")
    p.add_argument("--synthetic_max_patches", type=int, default=2000)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    p.add_argument("--resume", action="store_true",
                   help="skip (fold, shot) episodes whose result JSON exists "
                        "(preemption-safe sweeps; the reference's de-facto "
                        "per-process isolation, SURVEY.md §5.3)")
    p.add_argument("--mode", default="auto", choices=["auto", "fused", "stream"],
                   help="fused = one vmapped program per shot (episodes "
                        "sharded over devices); stream = per-episode loop "
                        "with streamed eval chunks; auto = fused when the "
                        "stacked episodes fit --fused_hbm_gb")
    p.add_argument("--fused_hbm_gb", type=float, default=6.0,
                   help="auto-mode HBM budget for the fused path's device "
                        "footprint: the invocation's SHARED slide pool "
                        "(union over all requested shots/folds — it stays "
                        "committed across shots) plus the widest shot's "
                        "hoisted eval packs; split shots across invocations "
                        "to get per-shot budgets")
    add_perf_flags(p)
    return p.parse_args(argv)


def _episode_mesh(n_episodes: int):
    """Largest whole-divisor slice of the visible devices as a ``data`` mesh
    (episode-parallelism = the reference's process-per-GPU fan-out).

    In a multi-process runtime this is the LOCAL devices: the sweep CLI
    stays process-independent (results fetched/written host-side per
    episode) — split shots/folds across hosts via ``--shots``/``--folds``;
    the library path (``moc.run_sweep(mesh=...)``) is the global-mesh one
    (certified across processes in ``tests/test_runtime.py``)."""
    import numpy as np

    import jax

    devices = (jax.local_devices() if jax.process_count() > 1
               else jax.devices())
    n = max(d for d in range(1, len(devices) + 1) if n_episodes % d == 0)
    if n <= 1:
        return None
    return jax.sharding.Mesh(np.array(devices[:n]), ("data",))


# One-entry cross-invocation pool cache: repeated sweeps over an unchanged
# corpus (serving drills, bench draws, grid re-runs in one process) skip the
# bag re-read and re-pack entirely. Keyed on the resolved bag FILES
# (path, mtime_ns, size) plus ids/labels, so any on-disk change misses; the
# cached arrays are frozen (read-only), which also makes them eligible for
# the device cache's digest memo — a fully-warm draw does no hashing and no
# host->device transfer.
_HOST_POOL_CACHE: dict = {}


def _pool_cache_key(data_dir, ids, table):
    sig = []
    for sid in ids:
        for sub, ext in (("h5_files", ".h5"), ("pt_files", ".pt")):
            p = os.path.join(data_dir, sub, f"{sid}{ext}")
            if os.path.exists(p):
                st = os.stat(p)
                sig.append((p, st.st_mtime_ns, st.st_size))
                break
        else:
            return None  # unresolved layout: don't cache
    labels = tuple(table.label_of(s) for s in ids)
    return (data_dir, tuple(ids), labels, tuple(sig))


class _PoolContext:
    """One CLI invocation's slide pool, shared across shots.

    Every shot's splits draw the same corpus, so the union of slides over
    ALL requested (shot, fold) pairs is read and packed once on the host
    and committed to the device once — later shots reuse the committed
    arrays and only ship their (tiny) index matrices (the default
    ``--shots 1 2 4 8`` protocol otherwise re-transfers the pool 4×).
    """

    def __init__(self, feats, mask, row, labels):
        # freeze the pool: read-only arrays are eligible for the device
        # cache's digest memo (``utils.device_cache._array_digest``), so
        # repeated draws skip the ~0.45 s/256 MB content re-hash too
        for a in (feats, mask):
            if hasattr(a, "flags"):
                a.flags.writeable = False
        self.feats, self.mask = feats, mask
        self.row, self.labels = row, labels
        self._dev = None

    def device(self):
        """Committed (pool_feats, pool_mask, transfer_seconds); the
        transfer happens on the FIRST call only — and not at all when an
        earlier invocation in this process already shipped an identical
        pool (``utils.device_cache``: repeated sweeps/draws over one
        corpus reuse the device-resident buffers, content-fingerprinted)."""
        import numpy as _np

        from moc_tpu.utils.device_cache import device_put_cached

        t0 = time.perf_counter()
        if self._dev is None:
            (f, m), hit = device_put_cached(self.feats, self.mask)
            if not hit:
                # block_until_ready returns EARLY through the axon tunnel;
                # only fetching result bytes synchronizes (verify SKILL.md
                # gotcha), so pull one element to pin the transfer's timing
                _np.asarray(f[(0,) * f.ndim])
            self._dev = (f, m)
        return (*self._dev, time.perf_counter() - t0)


def run_fused_shot(args, shot, folds, *, splits, pool_ctx, w, w_ext, cfg,
                   n_classes, shot_dir):
    """All requested folds of one shot as a single compiled sweep.

    The zero-shot floor is computed INSIDE the fused program (``with_zs``) —
    it is three extra vmapped pooling passes over bags already in HBM, so the
    only host work per episode is bag IO, the pool pack and result writing
    (the r2 CLI spent ~24x the device time streaming the floor chunk-by-chunk
    — VERDICT r2 weak #1). Bags cross the host→device wire DEDUPLICATED and
    ONCE PER INVOCATION: folds and shots share corpus slides (often the
    identical test set), so the union of slides transfers once as a pool
    (``_PoolContext``) and episodes are assembled by on-device gathers
    inside the program (``moc.sweep.PooledEpisodes`` — ~4.4× fewer bytes at
    the bench operating point; the transfer was the fused CLI's wall-clock
    on the ~50 MB/s axon tunnel, BENCH_NOTES "Round 3"). The pool stays
    host-resident until the auto-mode HBM estimate has decided this path
    runs at all.
    """
    import jax.numpy as jnp

    from moc_tpu.moc import (
        PooledEpisodes,
        episode_index,
        pooled_bytes_estimate,
        run_sweep_pooled,
        sweep_episode_results,
    )
    from moc_tpu.moc.results import write_episode_result, write_zeroshot_result

    repeat_num = shot * n_classes
    t0 = time.perf_counter()
    try:
        index = episode_index(splits, pool_ctx.row, pool_ctx.labels)
    except ValueError as e:
        # e.g. unequal train splits within the shot (a class exhausted in
        # one fold): fusing is shape-impossible, not just over budget
        if args.mode == "auto":
            print(f"shot {shot}: {e}; streaming instead", file=sys.stderr)
            return None  # caller falls back to the streaming path
        raise
    pooled = PooledEpisodes(pool_ctx.feats, pool_ctx.mask, index)
    if args.mode == "auto" and (pooled_bytes_estimate(pooled, cfg)
                                > args.fused_hbm_gb * 2**30):
        print(f"shot {shot}: stacked episodes exceed --fused_hbm_gb "
              f"{args.fused_hbm_gb}; streaming instead", file=sys.stderr)
        return None  # caller falls back to the streaming path
    t_stack = time.perf_counter() - t0

    mesh = _episode_mesh(len(folds))
    # commit the shared pool (first shot pays the transfer; later shots and
    # the mesh path reuse the committed arrays — device-side replication)
    feats_dev, mask_dev, t_put = pool_ctx.device()
    pooled = PooledEpisodes(feats_dev, mask_dev, index)

    t0 = time.perf_counter()
    # every fold trains from the SAME seed — the reference runs each fold
    # as its own process with a hard-coded seed (main_moc.py:212,
    # moc_train.sh), and cli.main_moc does the same; review r3 aligned
    # the sweep so the two entry points produce identical per-fold runs
    seeds = jnp.asarray([args.seed for _ in folds], jnp.int32)
    result = run_sweep_pooled(pooled, w, w_ext, cfg, repeat_num=repeat_num,
                              seeds=seeds, mesh=mesh, with_zs=args.check_zeroshot)
    ep_results = sweep_episode_results(result)  # blocks on the device
    t_run = time.perf_counter() - t0

    from moc_tpu.utils.checkpoint import save_params

    t0 = time.perf_counter()
    for fold, ep_result in zip(folds, ep_results):
        if args.check_zeroshot:
            write_zeroshot_result(shot_dir, shot, fold, ep_result.zero_shot_train,
                                  ep_result.zero_shot_val, ep_result.zero_shot_test)
        write_episode_result(shot_dir, shot, fold, ep_result)
        save_params(os.path.join(shot_dir, f"best_model_shot_{shot}_fold_{fold}.msgpack"),
                    ep_result.params)
        print(f"shot {shot} fold {fold}: best_val={ep_result.best_val:.4f} "
              f"test={ep_result.test_at_best_val:.4f} (fused)")
    t_write = time.perf_counter() - t0
    print(f"shot {shot} fused breakdown: index={t_stack:.2f}s "
          f"device_put={t_put:.2f}s zs+train+eval={t_run:.2f}s "
          f"write={t_write:.2f}s ({len(folds)} episodes; pool io/pack are "
          f"per-invocation, printed once)", file=sys.stderr)
    return result


def main(argv=None) -> int:
    args = get_args(argv)
    setup_runtime(args)
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
                    feature_dim=w.shape[0], **perf_cfg_kwargs(args))

    t0 = time.perf_counter()
    n_run = 0
    todo: dict[int, list[int]] = {}
    for shot in args.shots:
        shot_dir = os.path.join(args.result_dir, f"{shot}_shot")
        folds = [
            f for f in args.folds
            if not (args.resume and os.path.exists(episode_result_path(shot_dir, shot, f)))
        ]
        for skipped in set(args.folds) - set(folds):
            print(f"shot {shot} fold {skipped}: done, skipping (--resume)")
        if folds:
            todo[shot] = folds

    pool_ctx = None
    shot_splits: dict[int, list] = {}
    if args.mode in ("auto", "fused") and todo:
        # one slide pool for the whole invocation: the union of slides over
        # every requested (shot, fold), read and packed once (fold- AND
        # shot-level dedupe; see _PoolContext)
        from moc_tpu.moc import pack_slide_pool, unique_split_ids

        shot_splits = {
            shot: [read_split_csv(split_path(shot, f)) for f in folds]
            for shot, folds in todo.items()
        }
        all_splits = [s for ss in shot_splits.values() for s in ss]
        ids = unique_split_ids(all_splits)
        pool_key = _pool_cache_key(data_dir, ids, table)
        cached_pool = _HOST_POOL_CACHE.get(pool_key) if pool_key else None
        if cached_pool is not None:
            pool_ctx = _PoolContext(*cached_pool)
            print(f"slide pool: {len(ids)} unique slides "
                  f"({pool_ctx.feats.nbytes / 2**20:.0f} MB) reused "
                  f"(host pool cache)", file=sys.stderr)
        if cached_pool is None:
            t_read = time.perf_counter()
            bags = loader.read_all(ids)
            t_read = time.perf_counter() - t_read
            t_pack = time.perf_counter()
            pool_ctx = _PoolContext(*pack_slide_pool(bags, ids))
            t_pack = time.perf_counter() - t_pack
            print(f"slide pool: {len(ids)} unique slides "
                  f"({pool_ctx.feats.nbytes / 2**20:.0f} MB) io={t_read:.2f}s "
                  f"pack={t_pack:.2f}s", file=sys.stderr)
            if pool_key is not None:
                _HOST_POOL_CACHE.clear()  # one entry bounds host RAM
                _HOST_POOL_CACHE[pool_key] = (pool_ctx.feats, pool_ctx.mask,
                                              pool_ctx.row, pool_ctx.labels)

    for shot, folds in todo.items():
        shot_dir = os.path.join(args.result_dir, f"{shot}_shot")
        n_run += len(folds)

        if args.mode in ("auto", "fused"):
            fused = run_fused_shot(args, shot, folds,
                                   splits=shot_splits[shot], pool_ctx=pool_ctx,
                                   w=w, w_ext=w_ext, cfg=cfg,
                                   n_classes=n_classes, shot_dir=shot_dir)
            if fused is not None:
                continue
            # run_fused_shot printed why (HBM budget or unequal folds)

        from moc_tpu.moc.results import write_zeroshot_result
        from moc_tpu.utils.checkpoint import save_params

        for fold in folds:
            split = read_split_csv(split_path(shot, fold))
            episode = EpisodeBags.load(loader, split.train, split.val, split.test,
                                       repeat_num=shot * n_classes)
            result = run_episode(episode, w, w_ext, cfg, seed=args.seed,
                                 check_zeroshot=args.check_zeroshot)
            if args.check_zeroshot:
                write_zeroshot_result(shot_dir, shot, fold, result.zero_shot_train,
                                      result.zero_shot_val, result.zero_shot_test)
            write_episode_result(shot_dir, shot, fold, result)
            save_params(os.path.join(shot_dir,
                                     f"best_model_shot_{shot}_fold_{fold}.msgpack"),
                        result.params)
            print(f"shot {shot} fold {fold}: best_val={result.best_val:.4f} "
                  f"test={result.test_at_best_val:.4f}")
    wall = time.perf_counter() - t0
    print(f"sweep wallclock: {wall:.1f}s ({n_run} episodes)")
    summarize(args.result_dir, shots=tuple(args.shots), folds=tuple(args.folds))
    return 0


if __name__ == "__main__":
    sys.exit(main())
