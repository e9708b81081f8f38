"""Zero-shot top-k patch visualization: bags → overlays, heatmaps, crops.

The reference ships this as a user-facing script
(``/root/reference/utils/conch_zs_topk_visual.py:100-295``): score every
patch against the zero-shot classifier, take the top-k coordinates per
class, draw class-colored rectangles on a thumbnail and crop the winning
patches from the WSI. This CLI is that workflow over CLAM feature bags —
OpenSlide-free by default (coordinate-grid rasters; raw-pixel crops only
with ``--wsi_dir`` + OpenSlide installed).

Per slide it writes into ``--out_dir``:

* ``<slide>_topk.csv`` — class, rank, x, y, score rows (the reference's
  printed coord lists, machine-readable)
* ``<slide>_overlay.png`` — class-colored top-k rectangles on the patch
  grid (ref thumbnail rectangles, lines 242-295)
* ``<slide>_heatmap_c<cls>.png`` — per-class patch-score raster, one-hue
  sequential ramp (light → dark), gray where no patch
* ``<slide>_c<cls>_r<rank>.png`` — raw patch crops (only with --wsi_dir)

  python -m moc_tpu.cli.visualize --feature_dir /data/features \
      --weights_npz cache/weights_nsclc_conch.npz --out_dir viz/

With ``--model_msgpack`` it instead renders TRAINED-model maps (the
reference computes these but ships no tool for them: CLAM attention
``model_clam.py:175-219``, CHIEF ``patch_probs`` ``model_chief.py:173-195``,
patch-level logits ``eval_utils.py:78-113``):

* ``<slide>_model_<map>.png`` — attention / CHIEF patch-prob rasters
* ``<slide>_model_heatmap_c<cls>.png`` — per-class patch-score rasters
* ``<slide>_model_topk.csv`` — top-k coords by trained patch score

  python -m moc_tpu.cli.visualize --feature_dir /data/features \
      --model_msgpack results/mil_shot_8_fold_0.msgpack \
      --model_type clam_sb --out_dir viz/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Zero-shot top-k visualization")
    p.add_argument("--dataset", default="nsclc",
                   choices=["nsclc", "rcc", "ebrains12", "ebrains30"])
    p.add_argument("--feature_dir", required=True,
                   help="CLAM feature dir ({h5_files,pt_files}); bags must "
                        "carry coords (h5)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--slides", nargs="*", default=None,
                   help="slide ids to render (default: every bag found)")
    p.add_argument("--topk", type=int, default=10,
                   help="patches per class in the overlay/CSV (ref top-k)")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--downsample", type=int, default=32,
                   help="raster downsample vs level-0 coords")
    p.add_argument("--temperature", type=float, default=56.3477,
                   help="CONCH logit scale for the heatmap softmax scores")
    p.add_argument("--score", default="prob", choices=["prob", "logit"],
                   help="heatmap value: per-patch softmax probability "
                        "(temperature-scaled, ref protocol) or raw logit")
    p.add_argument("--wsi_dir", default=None,
                   help="WSI dir: also crop the top-k patches (OpenSlide)")
    p.add_argument("--wsi_ext", default=".svs")
    p.add_argument("--level", type=int, default=0)
    # weight matrices: cached .npz, or built from a CONCH checkpoint
    p.add_argument("--weights_npz", default=None)
    p.add_argument("--conch_checkpoint", default=None)
    p.add_argument("--tokenizer_file", default=None)
    # trained-model mode: render attention / patch-score maps from a
    # checkpointed model instead of raw zero-shot weights
    p.add_argument("--model_msgpack", default=None,
                   help="trained checkpoint (train_mil / main_moc / sweep "
                        "output); switches to trained-model maps")
    p.add_argument("--model_kind", default="mil", choices=["mil", "moc"],
                   help="mil = a baseline MIL head (--model_type); moc = a "
                        "senet (needs --weights_npz + --weights_ext_npz)")
    p.add_argument("--model_type", default=None,
                   choices=["clam_sb", "clam_mb", "abmil", "transmil",
                            "mil", "chief"],
                   help="MIL head architecture (default: the checkpoint's "
                        "sidecar JSON)")
    p.add_argument("--model_size", default="conch")
    p.add_argument("--n_classes", type=int, default=None,
                   help="default: the dataset preset's class count")
    p.add_argument("--anatomic", type=int, default=0,
                   help="CHIEF anatomical-site index")
    p.add_argument("--weights_ext_npz", default=None,
                   help="extended (tumor+normal) weight matrix for "
                        "--model_kind moc")
    p.add_argument("--topj", type=int, default=400)
    p.add_argument("--topk_pool", type=int, default=10,
                   help="MOC pooling top-k (the senet config's topk)")
    p.add_argument("--sizes_json", default=None, metavar="PATH",
                   help="instead of rendering, write {slide: [w, h]} JSON "
                        "from bag coords (OpenSlide dims with --wsi_dir) — "
                        "the reference's utils/wsi_size.py scanner")
    p.add_argument("--platform", default=None)
    return p.parse_args(argv)


def _sequential_png(img: np.ndarray, path: str) -> None:
    """One-hue sequential raster (light → dark blue), NaN = neutral gray —
    magnitude reads as darkness, never a rainbow."""
    from PIL import Image

    finite = np.isfinite(img)
    lo = float(img[finite].min()) if finite.any() else 0.0
    hi = float(img[finite].max()) if finite.any() else 1.0
    t = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
    # light (near-white blue tint) -> dark blue
    light = np.array([239, 244, 252], np.float32)
    dark = np.array([21, 60, 133], np.float32)
    rgb = light[None, None] + np.nan_to_num(t)[..., None] * (dark - light)
    rgb[~finite] = np.array([229, 229, 229], np.float32)  # no patch: gray
    Image.fromarray(rgb.astype(np.uint8)).save(path)


def visualize_slide(bag, out_dir: str, *, weights: np.ndarray, topk: int,
                    patch_size: int, downsample: int, temperature: float,
                    score: str = "prob", wsi_path: str | None = None,
                    level: int = 0) -> list[str]:
    """Render one bag → list of files written (see module docstring)."""
    from PIL import Image

    from moc_tpu.viz import (crop_patches, render_heatmap,
                             render_topk_overlay, topk_patch_coords)

    if bag.coords is None:
        raise ValueError(f"{bag.slide_id}: bag has no coords (pt-only bag?) "
                         "— visualization needs the h5 coords dataset")
    feats = np.asarray(bag.features, np.float32)
    coords = np.asarray(bag.coords)
    logits = feats @ weights  # zero-shot patch scoring (ref zs pipeline)
    if score == "prob":
        z = logits * temperature
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        values = e / e.sum(axis=1, keepdims=True)
    else:
        values = logits
    written = []

    def _save(name, arr):
        path = os.path.join(out_dir, name)
        Image.fromarray(arr).save(path)
        written.append(path)

    _save(f"{bag.slide_id}_overlay.png",
          render_topk_overlay(logits, coords, k=topk,
                              patch_size=patch_size, downsample=downsample))
    for cls in range(values.shape[1]):
        hm = render_heatmap(values[:, cls], coords, patch_size=patch_size,
                            downsample=downsample)
        path = os.path.join(out_dir, f"{bag.slide_id}_heatmap_c{cls}.png")
        _sequential_png(hm, path)
        written.append(path)

    sel = topk_patch_coords(logits, coords, k=topk)
    csv_path = os.path.join(out_dir, f"{bag.slide_id}_topk.csv")
    with open(csv_path, "w") as f:
        f.write("class,rank,x,y,score\n")
        for cls, cc in sel.items():
            order = np.argsort(-logits[:, cls], kind="stable")[: len(cc)]
            for rank, (idx, (x, y)) in enumerate(zip(order, cc)):
                f.write(f"{cls},{rank},{int(x)},{int(y)},"
                        f"{values[idx, cls]:.6f}\n")
    written.append(csv_path)

    if wsi_path is not None:
        for cls, cc in sel.items():
            for rank, patch in enumerate(
                    crop_patches(wsi_path, cc, patch_size=patch_size,
                                 level=level)):
                _save(f"{bag.slide_id}_c{cls}_r{rank}.png", patch)
    return written


def visualize_slide_model(bag, out_dir: str, *, cfg, params, topk: int,
                          patch_size: int, downsample: int,
                          score: str = "prob", anatomic: int = 0,
                          wsi_path: str | None = None,
                          level: int = 0) -> list[str]:
    """Render one bag through a trained MIL head → files written."""
    from moc_tpu.viz import crop_patches, render_heatmap, topk_patch_coords
    from moc_tpu.viz.model_maps import trained_patch_maps

    if bag.coords is None:
        raise ValueError(f"{bag.slide_id}: bag has no coords (pt-only bag?) "
                         "— visualization needs the h5 coords dataset")
    feats = np.asarray(bag.features, np.float32)
    coords = np.asarray(bag.coords)
    valid = np.ones(feats.shape[0], bool)
    maps, class_scores, are_probs = trained_patch_maps(
        cfg, params, feats, valid, anatomic=anatomic)
    written = []

    def _raster(name, per_patch):
        path = os.path.join(out_dir, name)
        _sequential_png(render_heatmap(per_patch, coords,
                                       patch_size=patch_size,
                                       downsample=downsample), path)
        written.append(path)

    for name, per_patch in maps.items():
        _raster(f"{bag.slide_id}_model_{name}.png", per_patch)

    if class_scores is not None:
        if score == "prob" and not are_probs:
            z = class_scores - class_scores.max(axis=1, keepdims=True)
            e = np.exp(z)
            values = e / e.sum(axis=1, keepdims=True)
        else:
            values = class_scores
        for cls in range(values.shape[1]):
            _raster(f"{bag.slide_id}_model_heatmap_c{cls}.png",
                    values[:, cls])
        sel = topk_patch_coords(class_scores, coords, k=topk)
        csv_path = os.path.join(out_dir, f"{bag.slide_id}_model_topk.csv")
        with open(csv_path, "w") as f:
            f.write("class,rank,x,y,score\n")
            for cls, cc in sel.items():
                order = np.argsort(-class_scores[:, cls],
                                   kind="stable")[: len(cc)]
                for rank, (idx, (x, y)) in enumerate(zip(order, cc)):
                    f.write(f"{cls},{rank},{int(x)},{int(y)},"
                            f"{values[idx, cls]:.6f}\n")
        written.append(csv_path)
        if wsi_path is not None:
            from PIL import Image

            for cls, cc in sel.items():
                for rank, patch in enumerate(
                        crop_patches(wsi_path, cc, patch_size=patch_size,
                                     level=level)):
                    path = os.path.join(
                        out_dir, f"{bag.slide_id}_model_c{cls}_r{rank}.png")
                    Image.fromarray(patch).save(path)
                    written.append(path)
    return written


def visualize_slide_moc(bag, out_dir: str, *, moc_cfg, senet_params,
                        w, w_ext, topk: int, patch_size: int,
                        downsample: int, temperature: float,
                        score: str = "prob") -> list[str]:
    """Render one bag through a trained MOC senet: fused per-patch class
    heatmaps (union-gated), the union-selection map, and the per-view senet
    weight maps. See ``viz.model_maps.moc_patch_maps``."""
    from moc_tpu.viz import render_heatmap, topk_patch_coords
    from moc_tpu.viz.model_maps import moc_patch_maps

    if bag.coords is None:
        raise ValueError(f"{bag.slide_id}: bag has no coords (pt-only bag?) "
                         "— visualization needs the h5 coords dataset")
    feats = np.asarray(bag.features, np.float32)
    coords = np.asarray(bag.coords)
    maps, fused = moc_patch_maps(senet_params, feats,
                                 np.ones(feats.shape[0], bool), w, w_ext,
                                 moc_cfg)
    written = []

    def _raster(name, per_patch):
        path = os.path.join(out_dir, name)
        _sequential_png(render_heatmap(per_patch, coords,
                                       patch_size=patch_size,
                                       downsample=downsample), path)
        written.append(path)

    for name, per_patch in maps.items():
        _raster(f"{bag.slide_id}_moc_{name}.png", per_patch)

    union = maps["union"] > 0.5
    if score == "prob":
        z = fused * temperature
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        values = e / e.sum(axis=1, keepdims=True)
    else:
        values = fused
    for cls in range(values.shape[1]):
        # non-eligible patches render as no-patch gray (NaN), matching the
        # pooling's view of the slide
        _raster(f"{bag.slide_id}_moc_heatmap_c{cls}.png",
                np.where(union, values[:, cls], np.nan))

    gated = np.where(union[:, None], fused, -np.inf)
    # the union can admit fewer than topk patches — cap k so ineligible
    # (-inf-gated) rows never enter the CSV with finite-looking scores
    sel = topk_patch_coords(gated, coords, k=min(topk, int(union.sum())))
    csv_path = os.path.join(out_dir, f"{bag.slide_id}_moc_topk.csv")
    with open(csv_path, "w") as f:
        f.write("class,rank,x,y,score\n")
        for cls, cc in sel.items():
            order = np.argsort(-gated[:, cls], kind="stable")[: len(cc)]
            for rank, (idx, (x, y)) in enumerate(zip(order, cc)):
                f.write(f"{cls},{rank},{int(x)},{int(y)},"
                        f"{values[idx, cls]:.6f}\n")
    written.append(csv_path)
    return written


def _load_model(args, preset, probe_bag):
    """Build the MIL head + load the msgpack checkpoint (template from a
    probe bag's feature dim)."""
    import jax

    from moc_tpu.train.mil import MilTrainConfig, build_model
    from moc_tpu.utils.checkpoint import load_params

    n_classes = args.n_classes or preset.n_classes
    cfg = MilTrainConfig(model_type=args.model_type,
                         model_size=args.model_size, n_classes=n_classes)
    _, _, init_fn = build_model(cfg)
    feats = np.asarray(probe_bag.features, np.float32)
    template = init_fn(jax.random.PRNGKey(0), feats,
                       np.ones(feats.shape[0], bool))
    return cfg, load_params(args.model_msgpack, template)


def main(argv=None) -> int:
    args = get_args(argv)
    from moc_tpu.cli.common import setup_runtime

    setup_runtime(args)

    from moc_tpu.cli.serve import _discover, _read_bag_path
    from moc_tpu.config import PRESETS

    preset = PRESETS[args.dataset]

    if args.sizes_json:
        # slide-size scan (ref utils/wsi_size.py: per-slide {w, h} JSONs);
        # extent from coords, or true OpenSlide dims when --wsi_dir is
        # given. Needs no weights or model.
        import json

        from moc_tpu.viz import slide_extent

        found = _discover(args.feature_dir)
        slides = args.slides or sorted(found)
        missing = [s for s in slides if s not in found]
        if missing:
            raise SystemExit(f"no bags for slides {missing[:5]} under "
                             f"{args.feature_dir!r}")
        os.makedirs(args.out_dir, exist_ok=True)
        sizes = {}
        for sid in slides:
            bag = _read_bag_path(found[sid])
            if bag.coords is None:
                raise ValueError(f"{sid}: bag has no coords")
            wsi = (os.path.join(args.wsi_dir, sid + args.wsi_ext)
                   if args.wsi_dir else None)
            sizes[sid] = [int(v) for v in slide_extent(
                np.asarray(bag.coords), args.patch_size, wsi_path=wsi)]
        path = os.path.join(args.out_dir, args.sizes_json)
        with open(path, "w") as f:
            json.dump(sizes, f, indent=2)
        print(f"{len(sizes)} slide sizes -> {path}")
        return 0

    moc_mode = bool(args.model_msgpack) and args.model_kind == "moc"
    weights = w_ext = None
    if args.model_msgpack and not moc_mode:
        pass  # trained-MIL mode; loaded below from a probe bag
    elif args.weights_npz:
        weights = np.load(args.weights_npz)["weights"]
        if args.weights_ext_npz:
            w_ext = np.load(args.weights_ext_npz)["weights"]
    elif args.conch_checkpoint:
        from moc_tpu.cli.predict import _load_weights

        ns = argparse.Namespace(weights_npz=None, weights_ext_npz=None,
                                conch_checkpoint=args.conch_checkpoint,
                                tokenizer_file=args.tokenizer_file,
                                out=os.path.join(args.out_dir, "x"))
        weights, w_ext = _load_weights(ns, preset)
    else:
        raise SystemExit(
            "need --weights_npz, --conch_checkpoint, or --model_msgpack")
    if weights is not None:
        weights = np.asarray(weights, np.float32)
    if w_ext is not None:
        w_ext = np.asarray(w_ext, np.float32)

    moc_cfg = senet_params = None
    if moc_mode:
        if weights is None or w_ext is None:
            raise SystemExit("--model_kind moc needs both weight matrices: "
                             "--weights_npz + --weights_ext_npz, or a "
                             "--conch_checkpoint to build them")
        import jax

        from moc_tpu.moc import MOCConfig, init_senet
        from moc_tpu.utils.checkpoint import load_params
        moc_cfg = MOCConfig(n_classes=preset.n_classes,
                            n_ext_classes=preset.n_ext_classes,
                            topj=args.topj, topk=args.topk_pool,
                            feature_dim=weights.shape[0])
        template = init_senet(jax.random.PRNGKey(0), moc_cfg)[1]
        senet_params = load_params(args.model_msgpack, template)

    found = _discover(args.feature_dir)
    slides = args.slides or sorted(found)
    missing = [s for s in slides if s not in found]
    if missing:
        raise SystemExit(f"no bags for slides {missing[:5]} under "
                         f"{args.feature_dir!r}")
    os.makedirs(args.out_dir, exist_ok=True)
    model_cfg = model_params = None
    for sid in slides:
        bag = _read_bag_path(found[sid])
        wsi = (os.path.join(args.wsi_dir, sid + args.wsi_ext)
               if args.wsi_dir else None)
        if args.model_msgpack and not moc_mode and model_cfg is None:
            from moc_tpu.cli.predict import resolve_model_config

            resolve_model_config(args)
        if moc_mode:
            files = visualize_slide_moc(
                bag, args.out_dir, moc_cfg=moc_cfg,
                senet_params=senet_params, w=weights, w_ext=w_ext,
                topk=args.topk, patch_size=args.patch_size,
                downsample=args.downsample, temperature=args.temperature,
                score=args.score)
        elif args.model_msgpack:
            if model_cfg is None:
                model_cfg, model_params = _load_model(args, preset, bag)
            files = visualize_slide_model(
                bag, args.out_dir, cfg=model_cfg, params=model_params,
                topk=args.topk, patch_size=args.patch_size,
                downsample=args.downsample, score=args.score,
                anatomic=args.anatomic, wsi_path=wsi, level=args.level)
        else:
            files = visualize_slide(
                bag, args.out_dir, weights=weights, topk=args.topk,
                patch_size=args.patch_size, downsample=args.downsample,
                temperature=args.temperature, score=args.score,
                wsi_path=wsi, level=args.level)
        print(f"{sid}: {len(files)} files", file=sys.stderr)
    print(f"{len(slides)} slides -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
