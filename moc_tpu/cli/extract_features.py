"""Native patch-feature extraction: raw pixels → CLAM-schema bag files.

The reference repo CONSUMES pre-extracted feature dirs (its dataset code
reads ``h5_files/<slide>.h5`` produced by an external CLAM fork; see
``/root/reference/datasets/dataset_generic.py`` + ``dataset_h5.py``) — the
extraction step itself has no in-repo equivalent. This CLI closes that gap
natively: it reads raw-pixel patch bags (``imgs``-bearing h5, or coords-h5 +
WSI via OpenSlide), encodes them through the CONCH or MUSK vision tower on
the accelerator, and streams bag files (``features [N, D]`` + ``coords``)
that ``BagLoader`` / the MOC and MIL CLIs consume directly.

  python -m moc_tpu.cli.extract_features \
      --patch_dir /data/patches --out_dir /data/merge_features_conch \
      --backbone conch --checkpoint /path/conch.bin

Encoding runs one fixed-shape jitted program (tail batches are zero-padded
and trimmed) so every slide reuses a single compiled executable.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Patch-bag feature extraction")
    p.add_argument("--patch_dir", required=True,
                   help="dir with h5_files/<slide>.h5 patch bags (or the "
                        "h5 dir itself)")
    p.add_argument("--out_dir", required=True,
                   help="output feature dir (writes h5_files/<slide>.h5)")
    p.add_argument("--csv", default=None, help="optional slide_id list CSV")
    p.add_argument("--backbone", default="conch",
                   choices=["conch", "musk", "resnet50", "debug"],
                   help="vision tower ('resnet50' = the CLAM-legacy "
                        "truncated ImageNet trunk, 1024-d; 'debug' = "
                        "checkpoint-free projection for pipeline smoke "
                        "tests)")
    p.add_argument("--checkpoint", default=None,
                   help="CONCH/MUSK release checkpoint path")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each image batch over ALL visible devices "
                        "(tower params replicated) — the extraction step is "
                        "the production pipeline's FLOPs bulk (a ViT over "
                        "millions of patches); batch_size is rounded up to "
                        "a device-count multiple")
    p.add_argument("--image_size", type=int, default=None,
                   help="default: 448 (conch) / 384 (musk) / 64 (debug)")
    p.add_argument("--normalize_embeddings",
                   type=lambda s: s.lower() != "false", default=None,
                   help="L2-normalize embeddings (default: true — the "
                        "MI-Zero/MOC protocol — except resnet50, whose "
                        "CLAM-legacy features are consumed raw)")
    p.add_argument("--bf16", action="store_true",
                   help="encode in bfloat16 (serving-tier cast)")
    p.add_argument("--flash", action="store_true",
                   help="Pallas flash attention in the CONCH trunk — a "
                        "memory-headroom knob, NOT a speed knob: dense "
                        "materializes [B, H, 785, 785] scores per layer "
                        "(1.9 GB f32 at batch 64) where flash is O(L), but "
                        "dense measured FASTER at tower lengths (flash "
                        "0.77x f32 / 0.81x bf16 on v5 lite). Use only to "
                        "fit larger --batch under HBM pressure")
    p.add_argument("--resume", action="store_true",
                   help="skip slides whose output bag already exists")
    p.add_argument("--wsi_dir", default=None,
                   help="WSI dir for coords-only patch h5s (needs OpenSlide)")
    p.add_argument("--wsi_ext", default=".svs")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--level", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--xprof", default=None, metavar="DIR",
                   help="capture a jax.profiler trace for the run")
    return p.parse_args(argv)


def _default_image_size(backbone: str) -> int:
    # resnet50: CLAM feeds patches at native size (no resize) — 256 is the
    # standard CLAM patch; pass --image_size to match other patch sizes
    return {"conch": 448, "musk": 384, "resnet50": 256, "debug": 64}[backbone]


def build_encoder(backbone: str, checkpoint: str | None, image_size: int,
                  normalize: bool, bf16: bool, feature_dim: int = 512,
                  mesh=None, flash: bool = False):
    """``encode(images [B, S, S, 3] f32) -> np [B, D]`` on the accelerator.

    ``debug`` is a deterministic checkpoint-free random projection of the
    pixels — the full CLI pipeline without model weights (tests, dry runs).

    With ``mesh`` (a 1-axis ``data`` mesh from ``cli.common.serving_mesh``),
    tower params are replicated and each image batch is split on ``data`` —
    pure batch sharding, elementwise-identical embeddings; ``B`` must be a
    device-count multiple (the CLI rounds ``--batch_size`` up).
    """
    import jax
    import jax.numpy as jnp

    from moc_tpu.cli.common import replicate_to_mesh

    def _replicate(params):
        return replicate_to_mesh(params, mesh)

    def _cast(params):
        """bf16 serving cast: params AND images must both drop to bfloat16 —
        casting inputs alone gets promoted straight back to f32 by the f32
        kernels (the same rule as ``train.mil.half_precision_params``)."""
        if not bf16:
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    # tower params are ALWAYS jit arguments, never closure captures: a
    # closed-over array is baked into the HLO as a constant, and a ~350 MB
    # (CoCa) / ~1.2 GB (MUSK-large) constant blob breaks remote-compile
    # transports (measured: the axon tunnel's compile RPC rejects it with
    # HTTP 413) and bloats the persistent compile cache
    if backbone == "conch":
        if not checkpoint:
            raise ValueError("--backbone conch needs --checkpoint")
        from moc_tpu.zeroshot import load_conch

        model, params = load_conch(checkpoint, image_size=image_size,
                                   attn_impl="flash" if flash else "dense")
        params = _replicate(_cast(params))

        @jax.jit
        def pfn(p, images):
            if bf16:
                images = images.astype(jnp.bfloat16)
            emb = model.apply(p, images, normalize=normalize,
                              method=model.encode_image)
            return emb.astype(jnp.float32)

        fn = functools.partial(pfn, params)

    elif backbone == "musk":
        if not checkpoint:
            raise ValueError("--backbone musk needs --checkpoint")
        from moc_tpu.models.musk import MuskConfig
        from moc_tpu.zeroshot.convert_musk import load_musk

        model, params = load_musk(checkpoint, MuskConfig(image_size=image_size))
        params = _replicate(_cast(params))

        @jax.jit
        def pfn(p, images):
            if bf16:
                images = images.astype(jnp.bfloat16)
            emb, _, _ = model.apply(p, images=images, normalize=normalize)
            return emb.astype(jnp.float32)

        fn = functools.partial(pfn, params)

    elif backbone == "resnet50":
        if not checkpoint:
            raise ValueError("--backbone resnet50 needs --checkpoint "
                             "(a torchvision resnet50 .pth)")
        from moc_tpu.models.convert_resnet import load_resnet50

        model, variables = load_resnet50(checkpoint)
        variables = _replicate(_cast(variables))

        @jax.jit
        def pfn(p, images):
            if bf16:
                images = images.astype(jnp.bfloat16)
            emb = model.apply(p, images)  # [B, 1024], eval-mode BN
            if normalize:
                emb = emb / jnp.linalg.norm(
                    emb, axis=-1, keepdims=True).clip(1e-12)
            return emb.astype(jnp.float32)

        fn = functools.partial(pfn, variables)

    else:  # debug: fixed random projection, no weights
        key = jax.random.PRNGKey(0)

        @jax.jit
        def fn(images):
            flat = images.reshape(images.shape[0], -1)
            proj = jax.random.normal(key, (flat.shape[1], feature_dim),
                                     jnp.float32) / np.sqrt(flat.shape[1])
            emb = flat @ proj
            if normalize:
                emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-12)
            return emb

    if mesh is None:
        return lambda images: np.asarray(fn(np.asarray(images, np.float32)))

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("data", None, None, None))

    def encode(images):
        images = np.asarray(images, np.float32)
        if images.shape[0] % mesh.size:
            raise ValueError(f"batch {images.shape[0]} does not divide over "
                             f"the {mesh.size}-device data mesh")
        return np.asarray(fn(jax.device_put(images, batch_sharding)))

    return encode


def _prefetched(gen, depth: int = 2):
    """Run a batch generator on a background thread behind a bounded queue.

    Host patch reading + preprocessing (h5/WSI reads, resize, normalize)
    then overlaps device encoding: the encode call blocks on the device
    with the GIL released, so the worker prepares the next batches
    meanwhile. Exceptions re-raise at the consuming site."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    end = object()

    def _worker():
        try:
            for item in gen:
                q.put(item)
            q.put(end)
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            q.put(e)

    threading.Thread(target=_worker, daemon=True).start()
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def extract_slide(reader, encode, out_path: str, batch_size: int) -> int:
    """Stream one slide's patches through ``encode`` into a bag h5.

    Tail batches are zero-padded to ``batch_size`` (one compiled shape) and
    the padded rows trimmed before writing. Returns the patch count."""
    from moc_tpu.data.bags import append_hdf5

    tmp = out_path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    total = 0
    mode = "w"
    dim = None
    for imgs, coords in _prefetched(reader.batches(batch_size)):
        b = imgs.shape[0]
        if b < batch_size:  # pad the tail to the compiled shape
            pad = np.zeros((batch_size - b,) + imgs.shape[1:], imgs.dtype)
            feats = encode(np.concatenate([imgs, pad]))[:b]
        else:
            feats = encode(imgs)
        dim = feats.shape[-1]
        assets = {"features": feats}
        if coords is not None:
            assets["coords"] = np.asarray(coords)
        append_hdf5(tmp, assets, mode=mode)
        mode = "a"
        total += b
    if total == 0:
        # zero-patch slide (segmentation filtered everything): write an
        # empty bag instead of crashing the whole extraction run. Probe the
        # encoder for the real feature dim (same compiled shape as normal
        # batches) so the empty bag stays schema-consistent with the cohort
        # — a [0, 1] placeholder dim breaks downstream [*, N, D] stacking.
        from moc_tpu.data.bags import write_bag_h5

        if dim is None:
            s = getattr(reader, "image_size", 224)
            dim = encode(np.zeros((batch_size, s, s, 3), np.float32)).shape[-1]
        write_bag_h5(tmp, np.zeros((0, dim), np.float32),
                     np.zeros((0, 2), np.int32))
    os.replace(tmp, out_path)  # atomic: resume never sees half-written bags
    return total


def main(argv=None) -> int:
    args = get_args(argv)
    from moc_tpu.cli.common import round_up_to_mesh, serving_mesh, setup_runtime

    setup_runtime(args)
    mesh = serving_mesh() if args.data_parallel else None
    args.batch_size = round_up_to_mesh(args.batch_size, mesh)

    from moc_tpu.data.patches import CoordPatchReader, PatchBagReader, list_bags

    h5_dir = (os.path.join(args.patch_dir, "h5_files")
              if os.path.isdir(os.path.join(args.patch_dir, "h5_files"))
              else args.patch_dir)
    slides = (list_bags(args.patch_dir, args.csv) if args.csv
              else sorted(os.path.splitext(f)[0] for f in os.listdir(h5_dir)
                          if f.endswith(".h5")))
    import jax

    if jax.process_count() > 1:
        # multi-process pod (parallel.runtime): extraction is perfectly
        # parallel by slide — each process takes a disjoint strided slice
        # and writes its own per-slide bag files (atomic, no coordination)
        pid, n = jax.process_index(), jax.process_count()
        slides = slides[pid::n]
        print(f"process {pid}/{n}: extracting {len(slides)} slides",
              file=sys.stderr)
    image_size = args.image_size or _default_image_size(args.backbone)
    transform = {"musk": "musk", "resnet50": "imagenet"}.get(
        args.backbone, "clip")
    if args.normalize_embeddings is None:
        args.normalize_embeddings = args.backbone != "resnet50"
    encode = build_encoder(args.backbone, args.checkpoint, image_size,
                           args.normalize_embeddings, args.bf16, mesh=mesh,
                           flash=args.flash)
    out_h5 = os.path.join(args.out_dir, "h5_files")
    os.makedirs(out_h5, exist_ok=True)

    done = 0
    for slide in slides:
        out_path = os.path.join(out_h5, f"{slide}.h5")
        if args.resume and os.path.exists(out_path):
            print(f"{slide}: exists, skipping (--resume)")
            continue
        src = os.path.join(h5_dir, f"{slide}.h5")
        if args.wsi_dir:
            reader = CoordPatchReader(
                src, os.path.join(args.wsi_dir, slide + args.wsi_ext),
                patch_size=args.patch_size, level=args.level,
                image_size=image_size, transform=transform)
        else:
            reader = PatchBagReader(src, image_size=image_size,
                                    transform=transform)
        t0 = time.perf_counter()
        n = extract_slide(reader, encode, out_path, args.batch_size)
        print(f"{slide}: {n} patches -> {out_path} "
              f"({time.perf_counter() - t0:.1f}s)")
        done += 1
    print(f"extracted {done} slides")
    return 0


if __name__ == "__main__":
    sys.exit(main())
