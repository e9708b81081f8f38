"""moc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) few-shot whole-slide-image framework.

A from-scratch rebuild of the capabilities of xmed-lab/MOC (MICCAI 2025,
arXiv 2508.09967) designed TPU-first:

- bags of patch embeddings are **padded, masked arrays** (static shapes for XLA)
  instead of variable-length batch-1 tensors;
- the patch-selection / pooling family is a library of masked `jnp` ops
  (``moc_tpu.ops``) with a fused Pallas scoring kernel for the hot path;
- the MOC meta-optimized classifier's per-slide optimizer loop is
  ``jax.grad``-through-``lax.scan``, vmappable across few-shot episodes;
- MIL model zoo (CLAM/ABMIL/MIL-fc/TransMIL/ViLa-MIL/CHIEF/TITAN-style) in flax;
- mesh parallelism (data/sequence/expert axes) with XLA collectives replaces
  the reference's NCCL/`torch.distributed` machinery.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from moc_tpu import data  # noqa: F401
from moc_tpu import metrics  # noqa: F401
from moc_tpu import moc  # noqa: F401
from moc_tpu import models  # noqa: F401
from moc_tpu import nn  # noqa: F401
from moc_tpu import ops  # noqa: F401
from moc_tpu import parallel  # noqa: F401
from moc_tpu import zeroshot  # noqa: F401
