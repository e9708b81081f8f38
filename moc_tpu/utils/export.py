"""AOT serving-program export: the compiled forward as a deployable artifact.

``jax.export`` serializes the jitted scoring closure — senet/MIL parameters
and the zero-shot weight matrices baked in as constants — to a StableHLO
artifact that reloads and runs with NO model code, NO checkpoint files, and
NO Python re-trace. The padded patch dimension is exported SYMBOLIC
(``n >= min_pad``), so one artifact serves every bucket size the batcher
produces; batch size and feature dim are fixed at export time. Artifacts
declare ``platforms=("cpu", "tpu")`` — export on a CPU dev box, serve the
same file on TPU.

The reference has no analogue: scoring there means re-running the training
script with the full model stack importable (``main_moc.py:462-520``).
Wired into ``cli.predict --export_program/--from_program`` and
``cli.serve --from_program``.

Artifact format: a single ``.npz`` holding the serialized program bytes and
a JSON metadata record (batch_size, feature_dim, min_pad, dtype, and
caller extras like temperature/n_classes).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Mapping

FORMAT_VERSION = 1


def save_serving_program(path: str, batch_logits: Callable, params, *,
                         batch_size: int, feature_dim: int,
                         min_pad: int = 1024, dtype=None,
                         meta: Mapping[str, Any] | None = None,
                         platforms=("cpu", "tpu")) -> dict:
    """Export ``batch_logits(params, BagBatch) -> [B, C]`` and write it.

    The exported callable takes ``(features [B, n, D], mask [B, n])`` with
    ``n`` symbolic (``n >= min_pad``); ``params`` and everything else
    ``batch_logits`` closes over become baked-in constants. The int8
    serving tier exports as ``(features int8, scales [B, n] f32, mask)``
    (its bags carry per-row dequantization scales). Returns the full
    metadata dict written into the artifact.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export

    from moc_tpu.data.batching import BagBatch

    dtype = jnp.float32 if dtype is None else dtype
    is_int8 = jnp.dtype(dtype) == jnp.int8

    def _batch(features, mask, scales=None):
        return BagBatch(
            features=features, mask=mask, scales=scales,
            labels=jnp.full((features.shape[0],), -1, jnp.int32),
            n_patches=mask.sum(axis=1).astype(jnp.int32))

    if is_int8:
        def fn(features, scales, mask):
            return batch_logits(params, _batch(features, mask, scales))
    else:
        def fn(features, mask):
            return batch_logits(params, _batch(features, mask))

    n, = export.symbolic_shape("n", constraints=[f"n >= {min_pad}"])
    specs = [jax.ShapeDtypeStruct((batch_size, n, feature_dim), dtype)]
    if is_int8:
        specs.append(jax.ShapeDtypeStruct((batch_size, n), jnp.float32))
    specs.append(jax.ShapeDtypeStruct((batch_size, n), jnp.bool_))
    try:
        exported = export.export(jax.jit(fn), platforms=tuple(platforms))(
            *specs)
    except TypeError as e:
        raise ValueError(
            "this forward cannot be traced with a symbolic patch dimension "
            f"({e}) — architectures whose host-side shape math needs "
            "concrete sizes (e.g. transmil's square padding) are not "
            "exportable; serve them live") from e
    except Exception as e:
        if type(e).__name__ == "InconclusiveDimensionOperation":
            raise ValueError(
                f"symbolic export needs a higher padded-patch floor "
                f"(min_pad={min_pad}): {e}") from e
        raise
    full_meta = dict(meta or {})
    full_meta.update(
        format_version=FORMAT_VERSION, batch_size=batch_size,
        feature_dim=feature_dim, min_pad=min_pad,
        dtype=jnp.dtype(dtype).name, platforms=list(exported.platforms))
    blob = exported.serialize()
    with open(path, "wb") as f:  # exact path (np.savez would append .npz)
        np.savez(f, program=np.frombuffer(blob, np.uint8),
                 meta=json.dumps(full_meta))
    return full_meta


@dataclasses.dataclass(frozen=True)
class ServingProgram:
    """A reloaded artifact: ``call(features, mask) -> logits`` + metadata."""

    call: Callable
    meta: dict

    def batch_logits(self, params, batch):
        """Adapter matching the live ``batch_logits(params, BagBatch)``
        signature (``params`` ignored — they are baked into the program),
        so ``score_bags``/``Server`` run unchanged from an artifact."""
        del params
        if self.meta["dtype"] == "int8":
            return self.call(batch.features, batch.scales, batch.mask)
        return self.call(batch.features, batch.mask)


def load_serving_program(path: str) -> ServingProgram:
    """Reload an artifact written by :func:`save_serving_program`."""
    import numpy as np
    from jax import export

    with np.load(path, allow_pickle=False) as z:
        blob = z["program"].tobytes()
        meta = json.loads(str(z["meta"]))
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported program format "
                         f"{meta.get('format_version')!r} in {path!r}")
    import jax

    exported = export.deserialize(blob)
    # jit the call: without it every invocation re-traces and re-compiles
    # the refined module (measured: minutes/run through a TPU tunnel); under
    # jit each concrete bucket shape compiles once per process and lands in
    # the persistent compilation cache like any other program
    return ServingProgram(call=jax.jit(exported.call), meta=meta)
