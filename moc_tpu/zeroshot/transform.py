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


def preprocess_image(image, image_size: int = 448) -> np.ndarray:
    """PIL image or uint8 array ``[H, W, 3]`` → normalized ``[H', W', 3]`` f32."""
    try:
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        w, h = image.size
        scale = image_size / min(w, h)
        image = image.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        arr = np.asarray(image, dtype=np.float32) / 255.0
    except ImportError:  # PIL-free fallback: nearest resize via indexing
        arr = np.asarray(image, dtype=np.float32) / 255.0
        h, w = arr.shape[:2]
        scale = image_size / min(h, w)
        yi = np.clip((np.arange(round(h * scale)) / scale).astype(int), 0, h - 1)
        xi = np.clip((np.arange(round(w * scale)) / scale).astype(int), 0, w - 1)
        arr = arr[yi][:, xi]
    h, w = arr.shape[:2]
    top, left = (h - image_size) // 2, (w - image_size) // 2
    arr = arr[top : top + image_size, left : left + image_size]
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    return (arr - mean) / std


def preprocess_batch(images, image_size: int = 448) -> np.ndarray:
    return np.stack([preprocess_image(im, image_size) for im in images])
