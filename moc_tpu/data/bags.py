"""Bag file IO in the CLAM schema.

A *bag* is one whole-slide image pre-processed into a set of patch embeddings.
On disk (written by the external CLAM pipeline the reference consumes,
``/root/reference/datasets/dataset_generic.py:407-433``):

  * ``<root>/h5_files/<slide_id>.h5`` — HDF5 with datasets ``features [N, D]``
    (float) and ``coords [N, 2]`` (int patch grid coordinates).
  * ``<root>/pt_files/<slide_id>.pt`` — torch-saved ``features [N, D]`` only.

All readers return host numpy; device placement happens in ``batching``.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

try:  # h5py is the canonical path; degrade gracefully if absent.
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


@dataclasses.dataclass(frozen=True)
class Bag:
    """One slide's worth of patch embeddings (host-side, unpadded)."""

    slide_id: str
    features: np.ndarray  # [N, D] float32
    coords: np.ndarray | None = None  # [N, 2] int32, optional
    label: int | None = None
    path: str | None = None

    @property
    def n_patches(self) -> int:
        return int(self.features.shape[0])

    @property
    def dim(self) -> int:
        return int(self.features.shape[1])


def read_bag_h5(path: str, slide_id: str | None = None, label: int | None = None) -> Bag:
    """Read an ``h5_files`` bag (``features`` + ``coords`` datasets)."""
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for .h5 bag files")
    with h5py.File(path, "r") as f:
        features = np.asarray(f["features"][:], dtype=np.float32)
        coords = np.asarray(f["coords"][:], dtype=np.int32) if "coords" in f else None
    if slide_id is None:
        slide_id = os.path.splitext(os.path.basename(path))[0]
    return Bag(slide_id=slide_id, features=features, coords=coords, label=label, path=path)


def read_bag_pt(path: str, slide_id: str | None = None, label: int | None = None) -> Bag:
    """Read a ``pt_files`` bag (torch-saved features tensor). Host-side only."""
    import torch  # torch (cpu) is interop-only: we never compute with it.

    features = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(features, "numpy"):
        features = features.numpy()
    features = np.asarray(features, dtype=np.float32)
    if slide_id is None:
        slide_id = os.path.splitext(os.path.basename(path))[0]
    return Bag(slide_id=slide_id, features=features, coords=None, label=label, path=path)


def bag_patch_count(data_dir: str, slide_id: str, *, use_h5: bool = True) -> int | None:
    """Patch count from h5 METADATA only (no feature bytes read) — drives
    bucketization for the streaming loader. Returns None when only a
    ``pt_files`` bag exists (torch files carry no cheap header)."""
    path = os.path.join(data_dir, "h5_files", f"{slide_id}.h5")
    if use_h5 and h5py is not None and os.path.exists(path):
        with h5py.File(path, "r") as f:
            return int(f["features"].shape[0])
    return None


def read_bag(data_dir: str, slide_id: str, *, use_h5: bool = True, label: int | None = None) -> Bag:
    """Resolve ``<data_dir>/{h5_files,pt_files}/<slide_id>.{h5,pt}`` and read it.

    Mirrors the dual-mode resolution of the reference MIL dataset
    (``dataset_generic.py:407-425``); ``use_h5`` picks the coord-bearing file.
    """
    if use_h5:
        return read_bag_h5(os.path.join(data_dir, "h5_files", f"{slide_id}.h5"), slide_id, label)
    return read_bag_pt(os.path.join(data_dir, "pt_files", f"{slide_id}.pt"), slide_id, label)


def write_bag_h5(path: str, features: np.ndarray, coords: np.ndarray | None = None) -> None:
    """Write a CLAM-schema bag file (test fixtures / converters).

    Equivalent of the reference's ``save_hdf5`` helper
    (``/root/reference/utils/file_utils.py:16-34``).
    """
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for .h5 bag files")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("features", data=np.asarray(features, dtype=np.float32))
        if coords is not None:
            f.create_dataset("coords", data=np.asarray(coords, dtype=np.int32))


def append_hdf5(path: str, asset_dict: dict, attr_dict: dict | None = None,
                mode: str = "a") -> str:
    """Streaming HDF5 writer with the reference ``save_hdf5`` semantics
    (``/root/reference/utils/file_utils.py:16-34``): first write of a key
    creates a chunked, unlimited-first-axis dataset (+ per-key attrs);
    subsequent writes resize and append along axis 0. This is how per-batch
    patch features/coords are streamed to one bag file during extraction.
    """
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for .h5 bag files")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, mode) as f:
        for key, val in asset_dict.items():
            val = np.asarray(val)
            if key not in f:
                dset = f.create_dataset(
                    key, shape=val.shape, maxshape=(None,) + val.shape[1:],
                    chunks=(1,) + val.shape[1:], dtype=val.dtype)
                dset[:] = val
                for attr_key, attr_val in (attr_dict or {}).get(key, {}).items():
                    dset.attrs[attr_key] = attr_val
            else:
                if val.shape[0] == 0:
                    continue  # dset[-0:] selects EVERYTHING, not nothing
                dset = f[key]
                dset.resize(len(dset) + val.shape[0], axis=0)
                dset[-val.shape[0]:] = val
    return path


def save_pkl(path: str, obj) -> None:
    """Pickle writer (ref ``utils/file_utils.py:4-8``)."""
    import pickle

    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pkl(path: str):
    """Pickle reader (ref ``utils/file_utils.py:10-14``)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
