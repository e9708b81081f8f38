"""Pipeline parallelism: GPipe-style stage execution over a ``pipe`` mesh axis.

Absent from the reference (SURVEY.md §2.6 parallelism checklist: "PP:
absent") but first-class here: the layer stack is split into S stages, one
per device along the ``pipe`` axis; microbatches stream through the stages
with ``lax.ppermute`` point-to-point transfers (ICI neighbors), overlapping
stage compute with the next microbatch's transfer. The standard S−1-step
bubble applies at fill and drain.

Run inside ``shard_map``: stage parameters arrive pre-sharded over the pipe
axis (leading stage dimension of size 1 locally), activations rotate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    microbatches: jax.Array,
    axis_name: str,
    num_stages: int,
    gather_output: bool = True,
):
    """Run ``microbatches [M, ...]`` through ``num_stages`` pipeline stages.

    Inside shard_map over ``axis_name``; ``stage_params`` is THIS device's
    stage parameters (pipe-sharded by the caller). ``stage_fn(params, x)``
    maps one microbatch through one stage (shape-preserving). Returns the
    fully-processed microbatches ``[M, ...]`` (valid on the last stage;
    callers typically ``ppermute``/psum the result out or keep loss local).
    """
    m = microbatches.shape[0]
    s = num_stages
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % s) for i in range(s)]

    state = jnp.zeros_like(microbatches[0])  # current activation on this stage
    outputs = jnp.zeros_like(microbatches)

    for t in range(m + s - 1):
        # stage 0 ingests microbatch t (if any); others use what arrived
        feed = microbatches[min(t, m - 1)]
        x = jnp.where(idx == 0, feed, state)
        y = stage_fn(stage_params, x)
        # last stage stores finished microbatch t-(s-1)
        done = t - (s - 1)
        if 0 <= done < m:
            outputs = jnp.where(
                (idx == s - 1),
                outputs.at[done].set(y),
                outputs,
            )
        # rotate activations to the next stage (wraps to 0, ignored there)
        state = jax.lax.ppermute(y, axis_name, perm)
    if gather_output:
        # finished microbatches live on the last stage only (zeros elsewhere)
        outputs = jax.lax.psum(outputs, axis_name)
    return outputs
