"""Image preprocessing for the CONCH vision tower (host-side, numpy/PIL).

Behavioral reference ``/root/reference/models/conch/open_clip_custom/
{transform,constants}.py``: bicubic resize of the short side, center crop to
``image_size``, scale to [0,1], normalize with the OpenAI CLIP statistics.
Output is NHWC float32 (flax convention; the torch original is NCHW).
"""

from __future__ import annotations

import numpy as np

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)

IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)

# torchvision ImageNet statistics (ref dataset_h5.eval_transforms)
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def _resize_short_side_dims(w: int, h: int, size: int) -> tuple[int, int]:
    """torchvision ``Resize(int)`` output dims ``(w', h')``: short side set to
    ``size`` exactly, long side ``int(size * long / short)`` — FLOORED, not
    rounded (``torchvision.transforms.functional.resize``); a round() here
    shifts every output pixel of a e.g. 700×1000 patch by one."""
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if w <= h else (new_long, new_short)


def _center_crop_origin(h: int, w: int, size: int) -> tuple[int, int]:
    """torchvision ``CenterCrop`` origin: ``int(round((dim - size) / 2))``
    (Python banker's rounding), NOT floor — they differ whenever the
    resized-minus-crop difference is odd."""
    return int(round((h - size) / 2.0)), int(round((w - size) / 2.0))


def _resize_to_unit(image, image_size: int, *, aspect_preserving: bool,
                    interp: str) -> np.ndarray:
    """Shared resize(+crop) core of every transform variant: PIL image or
    uint8 array → ``[image_size, image_size, 3]`` float32 in [0, 1].

    ``aspect_preserving=True`` is the torchvision Resize(short-side)+
    CenterCrop pipeline; ``False`` is a direct square resize (the PLIP
    path). The PIL-free fallback is a nearest-neighbour index resize —
    shared here so a fix to its rounding applies to all variants."""
    try:
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        w, h = image.size
        dims = (_resize_short_side_dims(w, h, image_size)
                if aspect_preserving else (image_size, image_size))
        image = image.resize(
            dims, Image.BICUBIC if interp == "bicubic" else Image.BILINEAR)
        arr = np.asarray(image, dtype=np.float32) / 255.0
    except ImportError:  # PIL-free fallback: nearest resize via indexing
        arr = np.asarray(image, dtype=np.float32) / 255.0
        h, w = arr.shape[:2]
        nw, nh = (_resize_short_side_dims(w, h, image_size)
                  if aspect_preserving else (image_size, image_size))
        yi = np.clip((np.arange(nh) * h / nh).astype(int), 0, h - 1)
        xi = np.clip((np.arange(nw) * w / nw).astype(int), 0, w - 1)
        arr = arr[yi][:, xi]
    if aspect_preserving:
        h, w = arr.shape[:2]
        top, left = _center_crop_origin(h, w, image_size)
        arr = arr[top : top + image_size, left : left + image_size]
    return arr


def _normalize(arr: np.ndarray, mean, std) -> np.ndarray:
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def preprocess_image(image, image_size: int = 448) -> np.ndarray:
    """PIL image or uint8 array ``[H, W, 3]`` → normalized ``[H', W', 3]`` f32."""
    arr = _resize_to_unit(image, image_size, aspect_preserving=True,
                          interp="bicubic")
    return _normalize(arr, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)


def preprocess_batch(images, image_size: int = 448) -> np.ndarray:
    return np.stack([preprocess_image(im, image_size) for im in images])


def preprocess_image_musk(image, image_size: int = 384) -> np.ndarray:
    """MUSK preprocessing (ref ``get_musk_transforms``,
    ``/root/reference/models/model_musk.py:98-106``): bicubic resize of the
    short side to ``image_size``, center crop to the square, scale to [0,1],
    normalize with the IMAGENET inception statistics (mean=std=0.5). Output
    NHWC-ordered ``[384, 384, 3]`` float32 (flax convention)."""
    arr = _resize_to_unit(image, image_size, aspect_preserving=True,
                          interp="bicubic")
    return _normalize(arr, IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD)


def preprocess_image_imagenet(image, image_size: int = 256) -> np.ndarray:
    """ImageNet-stats preprocessing for the CLAM-legacy ResNet-50 encoder
    (ref ``eval_transforms(pretrained=True)``,
    ``/root/reference/datasets/dataset_h5.py:21-35``: ToTensor + Normalize
    with the torchvision ImageNet statistics, NO resize — patches are fed
    at native size). ``image_size`` exists only to satisfy the fixed jit
    shape: with ``image_size`` equal to the patch size (the default CLAM
    256) this is the reference-exact no-resize path; otherwise a direct
    bilinear square resize is applied first."""
    arr = _resize_to_unit(image, image_size, aspect_preserving=False,
                          interp="bilinear")
    return _normalize(arr, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD)


def preprocess_image_plip(image, image_size: int = 224,
                          normalize: bool = False) -> np.ndarray:
    """PLIP preprocessing variant (ref ``dataset_h5.py:159-189``,
    ``Whole_Slide_Bag_FP_PLIP``): direct non-aspect-preserving bilinear
    resize to ``image_size`` square, scale to [0, 1]. The reference ships
    with the CLIP-stats ``Normalize`` commented out, so ``normalize``
    defaults to False; pass True for the PLIP-processor-faithful path
    (same OpenAI statistics)."""
    arr = _resize_to_unit(image, image_size, aspect_preserving=False,
                          interp="bilinear")
    if normalize:
        arr = _normalize(arr, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)
    return arr
