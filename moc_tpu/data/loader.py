"""Bag loading and episode materialization with background prefetch.

Replaces the reference's torch ``DataLoader`` + worker-process pipeline
(``/root/reference/utils/utils.py:187-215``) with a thread-pooled HDF5 reader
feeding padded device batches. The ``repeat_num`` episode-lengthening trick
(``dataset_generic.py:380-396``: ``__len__`` returns ``repeat_num`` and
indices wrap modulo the real length) becomes an explicit oversampled index
sequence — data for a few-shot episode is loaded **once** and the train loop
scans over index permutations on device.
"""

from __future__ import annotations

import collections
import dataclasses
import hashlib
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Sequence

import numpy as np

from moc_tpu.data.bags import Bag, bag_patch_count, read_bag
from moc_tpu.data.batching import BagBatch, bucket_size, bucketize, pack_bags, DEFAULT_BUCKETS
from moc_tpu.data.table import SlideTable


def prefetch_to_device(batches: Iterable[BagBatch], depth: int = 2) -> Iterator[BagBatch]:
    """Keep ``depth`` batches in flight on the device ahead of the consumer.

    ``jax.device_put`` is asynchronous, so holding a small queue of
    already-dispatched batches overlaps host→device transfer with compute —
    the standard TPU input-pipeline trick. Works with host-numpy or
    device-resident batches (the latter pass through at no cost)."""
    import jax

    queue: collections.deque = collections.deque()
    for batch in batches:
        queue.append(jax.device_put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class BagLoader:
    """Reads bags for slides in a ``SlideTable`` with a host thread pool.

    Optional reference behaviors (``dataset_generic.py:380-440``):
      * ``bag_size``     — random fixed-size patch subset per read (seeded);
      * ``preselect``    — per-slide stored patch indices to subselect;
      * ``label_revert`` — invert binary labels (tumor0/normal1 ↔ 1/0).
    """

    def __init__(
        self,
        table: SlideTable,
        data_dir: str,
        *,
        use_h5: bool = True,
        num_workers: int = 8,
        cache: bool = False,
        cache_budget_gb: float | None = None,
        bag_size: int | None = None,
        preselect: dict[str, "np.ndarray"] | None = None,
        label_revert: bool = False,
        seed: int = 0,
    ):
        self.table = table
        self.data_dir = data_dir
        self.use_h5 = use_h5
        self.num_workers = num_workers
        self.bag_size = bag_size
        self.preselect = preselect
        self.label_revert = label_revert
        self.seed = seed
        self._cache: dict[str, Bag] | None = {} if cache else None
        # None = unbounded (small corpora / episode sweeps); set a budget on
        # real datasets whose bags exceed host RAM — least-recently-read
        # bags are evicted first
        self._cache_budget = (None if cache_budget_gb is None
                              else int(cache_budget_gb * 2**30))
        self._cache_bytes = 0
        # read() runs concurrently in the thread pool (read_all/stream_batches
        # may even submit the same slide twice in one filler chunk); all LRU
        # mutation — hit-touch, insert, byte accounting, eviction — happens
        # under this lock so concurrent readers can't double-pop or
        # double-count
        self._cache_lock = threading.Lock()

    def toggle_label_revert(self, toggle: bool) -> None:
        self.label_revert = toggle

    @staticmethod
    def _bag_bytes(bag: Bag) -> int:
        return bag.features.nbytes + (bag.coords.nbytes if bag.coords is not None else 0)

    def read(self, slide_id: str) -> Bag:
        bag = None
        if self._cache is not None:
            with self._cache_lock:
                bag = self._cache.pop(slide_id, None)
                if bag is not None:
                    self._cache[slide_id] = bag  # re-insert = LRU touch
        if bag is None:
            bag = read_bag(self.data_dir, slide_id, use_h5=self.use_h5,
                           label=self.table.label_of(slide_id))
            if self._cache is not None:
                with self._cache_lock:
                    if slide_id not in self._cache:  # lost race: count once
                        self._cache[slide_id] = bag
                        self._cache_bytes += self._bag_bytes(bag)
                    if self._cache_budget is not None:
                        while (self._cache_bytes > self._cache_budget
                               and len(self._cache) > 1):
                            oldest = next(iter(self._cache))
                            self._cache_bytes -= self._bag_bytes(
                                self._cache.pop(oldest))
        if self.preselect is not None and slide_id in self.preselect:
            idx = np.asarray(self.preselect[slide_id])
            bag = dataclasses.replace(
                bag, features=bag.features[idx],
                coords=bag.coords[idx] if bag.coords is not None else None,
            )
        elif self.bag_size is not None and bag.n_patches > self.bag_size:
            # per-slide rng derived from (seed, slide_id): thread-pool
            # completion order must not change which subset a slide gets
            # (a shared generator consumed in completion order made seeded
            # runs irreproducible; review r3)
            rng = np.random.default_rng(
                (self.seed, int.from_bytes(
                    hashlib.sha1(slide_id.encode()).digest()[:8], "little")))
            idx = rng.permutation(bag.n_patches)[: self.bag_size]
            bag = dataclasses.replace(
                bag, features=bag.features[idx],
                coords=bag.coords[idx] if bag.coords is not None else None,
            )
        if self.label_revert and bag.label is not None:
            bag = dataclasses.replace(bag, label=1 - bag.label)
        return bag

    def read_all(self, slide_ids: Sequence[str] | None = None) -> list[Bag]:
        ids = list(slide_ids) if slide_ids is not None else list(self.table.slide_ids)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            return list(pool.map(self.read, ids))

    def batches(
        self,
        *,
        batch_size: int = 8,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        with_coords: bool = False,
        shuffle_seed: int | None = None,
        shard: tuple[int, int] | None = None,
    ) -> Iterator[BagBatch]:
        """Yield bucketed padded batches covering the whole table.

        Bags are grouped by bucket so each (bucket, batch_size) pair compiles
        once; within a bucket, batches are chunks of ``batch_size`` (the last
        chunk is repeated-padded to full size with mask-invalidated rows so
        shapes stay static — consumers must weight by ``labels >= 0``).

        ``shard=(index, count)`` reads only every ``count``-th slide starting
        at ``index`` — shard-by-slide host IO for multi-host feeding (e.g.
        ``(jax.process_index(), jax.process_count())``); shards are disjoint
        and cover the table.
        """
        ids = list(self.table.slide_ids)
        if shard is not None:
            index, count = shard
            ids = ids[index::count]
        bags = self.read_all(ids)
        if shuffle_seed is not None:
            rng = np.random.default_rng(shuffle_seed)
            rng.shuffle(bags)
        for n_pad, group in sorted(bucketize(bags, buckets).items()):
            for i in range(0, len(group), batch_size):
                chunk = group[i : i + batch_size]
                real = len(chunk)
                while len(chunk) < batch_size:  # static batch: pad with dummies
                    filler = chunk[len(chunk) % real]
                    chunk = chunk + [dataclasses.replace(filler, label=-1)]
                yield pack_bags(chunk, n_pad=n_pad, with_coords=with_coords)

    def stream_batches(
        self,
        *,
        batch_size: int = 8,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        with_coords: bool = False,
        shuffle_seed: int | None = None,
        shard: tuple[int, int] | None = None,
        lookahead: int = 2,
    ) -> Iterator[BagBatch]:
        """Memory-bounded ``batches``: never materializes the whole table.

        Bucketization is driven by h5 shape METADATA (no feature bytes read
        up front); bags are then read chunk-by-chunk with the thread pool
        keeping ``lookahead`` chunks of per-slide reads in flight while the
        current batch is consumed — the host-IO pipeline for datasets larger
        than host RAM (SURVEY §7: feeding the chip from h5). Same chunk /
        filler / shard semantics as ``batches``; within-bucket slide order
        follows the shape scan instead of read completion, so output is
        deterministic. pt-only tables (no h5 headers) fall back to
        ``batches`` (counting a pt bag requires reading it anyway).
        """
        ids = list(self.table.slide_ids)
        if shard is not None:
            index, count = shard
            ids = ids[index::count]
        if shuffle_seed is not None:
            rng = np.random.default_rng(shuffle_seed)
            rng.shuffle(ids)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            counts = list(pool.map(
                lambda s: bag_patch_count(self.data_dir, s, use_h5=self.use_h5), ids))
        if any(c is None for c in counts):
            yield from self.batches(batch_size=batch_size, buckets=buckets,
                                    with_coords=with_coords,
                                    shuffle_seed=shuffle_seed, shard=shard)
            return
        if self.bag_size is not None:
            counts = [min(c, self.bag_size) for c in counts]
        if self.preselect is not None:
            # read() returns exactly the preselected rows (preselect
            # supersedes bag_size), so the bucket must size to THAT —
            # a metadata-derived bucket smaller than the preselect length
            # would silently truncate in the packer (which now raises)
            counts = [len(self.preselect[sid]) if sid in self.preselect else c
                      for sid, c in zip(ids, counts)]

        grouped: dict[int, list[str]] = {}
        for sid, c in zip(ids, counts):
            grouped.setdefault(bucket_size(c, buckets), []).append(sid)
        chunks: list[tuple[int, list[str], int]] = []  # (n_pad, ids, n_real)
        for n_pad, group in sorted(grouped.items()):
            for i in range(0, len(group), batch_size):
                chunk = group[i : i + batch_size]
                real = len(chunk)
                while len(chunk) < batch_size:
                    chunk = chunk + [chunk[len(chunk) % real]]
                chunks.append((n_pad, chunk, real))

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending: collections.deque = collections.deque()

            def submit(chunk_idx):
                n_pad, chunk_ids, real = chunks[chunk_idx]
                futures = [pool.submit(self.read, sid) for sid in chunk_ids]
                pending.append((n_pad, futures, real))

            for i in range(min(lookahead + 1, len(chunks))):
                submit(i)
            for i in range(len(chunks)):
                n_pad, futures, real = pending.popleft()
                if i + lookahead + 1 < len(chunks):
                    submit(i + lookahead + 1)
                bags = [f.result() for f in futures]
                bags = bags[:real] + [dataclasses.replace(b, label=-1)
                                      for b in bags[real:]]
                yield pack_bags(bags, n_pad=n_pad, with_coords=with_coords)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


@dataclasses.dataclass
class EpisodeBags:
    """All bags of one few-shot episode, materialized and padded once.

    ``train`` is a single ``BagBatch`` (few-shot: shot×C slides); ``val`` and
    ``test`` are lists of fixed-size chunks (streamed at eval time). The
    oversampled train order of the reference (``repeat_num`` = shot×C visits
    per epoch) is produced by ``train_epoch_order``.
    """

    train: BagBatch
    val: list[BagBatch]
    test: list[BagBatch]
    repeat_num: int

    @classmethod
    def load(
        cls,
        loader: BagLoader,
        train_ids: Sequence[str],
        val_ids: Sequence[str],
        test_ids: Sequence[str],
        *,
        repeat_num: int | None = None,
        eval_batch_size: int = 8,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        eval_device_budget_gb: float = 4.0,
        device_put: bool = True,
    ) -> "EpisodeBags":
        """Materialize one episode's bags. The (small) train batch always
        lives on device; the eval chunks stay device-resident only while
        their total padded size fits ``eval_device_budget_gb`` — beyond
        that they are packed host-side and transfer lazily per jit call, so
        a full real dataset (tens of GB padded) cannot OOM HBM at load.

        ``device_put=False`` keeps EVERYTHING host-resident — required when
        the caller will restack/place the bags itself (the fused sweep) or
        when several episodes are loaded before deciding where they run, so
        n folds cannot stack up HBM allocations before the decision."""
        train_bags = loader.read_all(train_ids)
        n_pad = bucket_size(max(b.n_patches for b in train_bags), buckets)
        train = pack_bags(train_bags, n_pad=n_pad, device_put=device_put)

        def grouped(ids: Sequence[str]):
            bags = loader.read_all(ids)
            groups = []
            for bn_pad, group in sorted(bucketize(bags, buckets).items()):
                for i in range(0, len(group), eval_batch_size):
                    chunk = group[i : i + eval_batch_size]
                    while len(chunk) < eval_batch_size:
                        chunk = chunk + [dataclasses.replace(chunk[0], label=-1)]
                    groups.append((bn_pad, chunk))
            return groups

        val_groups = grouped(val_ids)
        test_groups = grouped(test_ids)
        dim = train_bags[0].dim
        eval_bytes = sum(
            eval_batch_size * bn_pad * dim * 4 for bn_pad, _ in val_groups + test_groups
        )
        on_device = device_put and eval_bytes <= eval_device_budget_gb * 2**30

        def pack(groups):
            return [pack_bags(chunk, n_pad=bn_pad, device_put=on_device)
                    for bn_pad, chunk in groups]

        return cls(
            train=train,
            val=pack(val_groups),
            test=pack(test_groups),
            repeat_num=repeat_num if repeat_num is not None else train.batch_size,
        )

    def train_epoch_order(self, rng: np.random.Generator | None = None,
                          shuffle: bool = False) -> np.ndarray:
        """Index sequence of one oversampled epoch: ``repeat_num`` visits that
        wrap modulo the real train size (ref ``dataset_generic.py:389-393``).

        The reference train loader is **unshuffled** (``main_moc.py:291``), so
        the default order is deterministic; pass ``shuffle=True`` + an rng to
        opt into per-epoch shuffling.
        """
        order = np.arange(self.repeat_num) % self.train.batch_size
        if shuffle:
            assert rng is not None
            rng.shuffle(order)
        return order
