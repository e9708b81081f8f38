"""moc_tpu.viz — host-side visualization (layer L8 of SURVEY.md).

Rebuild of the reference visual-debug tools
(``/root/reference/utils/conch_zs_topk_visual.py``, ``utils/wsi_size.py``):
per-class top-k patch extraction from zero-shot patch logits, thumbnail
overlays, and patch-score heatmaps. OpenSlide-backed raw-pixel crops are
optional (gated import); the coordinate-grid renderers work from bags alone.
"""

from moc_tpu.viz.topk import (
    topk_patch_coords,
    crop_patches,
    render_heatmap,
    render_topk_overlay,
    slide_extent,
)
from moc_tpu.viz.model_maps import trained_patch_maps

__all__ = [
    "topk_patch_coords",
    "crop_patches",
    "render_heatmap",
    "render_topk_overlay",
    "slide_extent",
    "trained_patch_maps",
]
