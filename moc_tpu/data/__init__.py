"""moc_tpu.data — host-side WSI bag IO, slide tables, splits, and TPU batching.

TPU-native rebuild of the reference data stack (layers L0-L2 of SURVEY.md):

  * ``bags``      — CLAM-schema bag files (``h5_files/<slide>.h5`` with
                    ``features``/``coords`` datasets, ``pt_files/<slide>.pt``),
                    reference ``datasets/dataset_generic.py:407-433``.
  * ``table``     — slide tables from dataset CSVs with label dicts, patient
                    grouping/voting, per-class registries
                    (``datasets/dataset_generic.py:38-340``).
  * ``splits``    — split CSV IO (column + boolean styles) and seeded split
                    generation incl. few-shot k-per-class
                    (``utils/utils.py:296-370``, ``dataset_generic.py:22-35``).
  * ``batching``  — padded/masked ``Bag``/``BagBatch`` pytrees with bucketed
                    static shapes: the TPU replacement for the reference's
                    shape-polymorphic batch-1 loaders (``utils/utils.py:154-215``).
  * ``loader``    — background-thread prefetching bag loaders with
                    ``repeat_num`` episode-lengthening semantics
                    (``dataset_generic.py:380-396``).
  * ``synthetic`` — deterministic synthetic bag corpora for tests/benchmarks
                    (extends the reference's ``dummy_dim``/``dummy_size`` hooks,
                    ``models/conch/downstream/wsi_datasets.py:46``).
"""

from moc_tpu.data.bags import (
    Bag,
    append_hdf5,
    load_pkl,
    read_bag,
    read_bag_h5,
    read_bag_pt,
    save_pkl,
    write_bag_h5,
)
from moc_tpu.data.batching import (
    BagBatch,
    bucket_size,
    pack_bags,
    pad_bag,
    DEFAULT_BUCKETS,
)
from moc_tpu.data.regions import RegionGrid, contour_check, grid_coords, points_in_polygon
from moc_tpu.data.table import SlideTable
from moc_tpu.data.splits import (
    Split,
    read_split_csv,
    write_split_csv,
    generate_splits,
    generate_fewshot_splits,
)
from moc_tpu.data.loader import BagLoader, EpisodeBags, prefetch_to_device
from moc_tpu.data.pseudo import (
    PatchPools,
    assemble_fixed_ratio_bag,
    assemble_mixed_bag,
    assemble_self_bag,
    prisec_order,
    pseudo_epoch,
)
from moc_tpu.data.patches import (CoordPatchReader, PatchBagReader,
                                  list_bags, open_slide)
from moc_tpu.data.segment import (TissueSegmentation, save_patch_coords,
                                  segment_tissue, segmented_grid)
from moc_tpu.data.vila_data import DualScaleBag, DualScaleLoader
from moc_tpu.data.synthetic import SyntheticWSIConfig, make_synthetic_corpus

__all__ = [
    "Bag",
    "read_bag",
    "read_bag_h5",
    "read_bag_pt",
    "write_bag_h5",
    "BagBatch",
    "bucket_size",
    "pack_bags",
    "pad_bag",
    "DEFAULT_BUCKETS",
    "SlideTable",
    "Split",
    "read_split_csv",
    "write_split_csv",
    "generate_splits",
    "generate_fewshot_splits",
    "BagLoader",
    "prefetch_to_device",
    "EpisodeBags",
    "SyntheticWSIConfig",
    "make_synthetic_corpus",
    "PatchPools",
    "assemble_fixed_ratio_bag",
    "assemble_mixed_bag",
    "assemble_self_bag",
    "prisec_order",
    "pseudo_epoch",
    "CoordPatchReader",
    "open_slide",
    "TissueSegmentation",
    "segment_tissue",
    "segmented_grid",
    "save_patch_coords",
    "PatchBagReader",
    "list_bags",
    "DualScaleBag",
    "DualScaleLoader",
]
