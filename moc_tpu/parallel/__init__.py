"""moc_tpu.parallel — mesh parallelism: DP/SP(CP)/TP/EP over XLA collectives.

The TPU-native replacement for the reference's ``torch.distributed``/NCCL
machinery (SURVEY.md §2.6, §5.8): a named ``jax.sharding.Mesh`` replaces
process groups; ``lax`` collectives inside ``shard_map`` replace the
hand-written autograd collectives (backward passes come from autodiff);
``jax.checkpoint`` replaces fairscale's checkpoint wrapper.

  * ``mesh``    — canonical axis names + mesh construction helpers;
  * ``dilated`` — LongNet dilated attention with lse branch recombination
    and gather-based sequence/context parallelism;
  * ``moe``     — GShard-style MoE: top-1/top-2 gating with static capacity,
    ``lax.all_to_all`` expert dispatch/combine, aux load-balancing loss.
"""

from moc_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_EXPERT,
    AXIS_SEQ,
    AXIS_TENSOR,
    make_hybrid_mesh,
    make_mesh,
    shard_spec,
)
from moc_tpu.parallel.dilated import dilated_attention, DilatedConfig
from moc_tpu.parallel.moe import MoEConfig, MoELayer, top1_gate, top2_gate, moe_dispatch_combine
from moc_tpu.parallel.pipeline import pipeline_apply
from moc_tpu.parallel.ring import ring_attention
from moc_tpu.parallel.runtime import (
    barrier,
    broadcast_from_leader,
    host_local_to_global,
    initialize_runtime,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_EXPERT",
    "AXIS_SEQ",
    "AXIS_TENSOR",
    "make_hybrid_mesh",
    "make_mesh",
    "shard_spec",
    "dilated_attention",
    "DilatedConfig",
    "MoEConfig",
    "MoELayer",
    "top1_gate",
    "top2_gate",
    "moe_dispatch_combine",
    "barrier",
    "broadcast_from_leader",
    "host_local_to_global",
    "initialize_runtime",
    "pipeline_apply",
    "ring_attention",
]
