"""moc_tpu.models — flax model zoo (MOC fusion net + MIL baselines + towers).

Rebuild of the reference model layer (SURVEY.md §2.4): the MOC ``senet``
fusion MLP, the MIL baseline heads (CLAM, ABMIL, MIL-fc, TransMIL, ViLa-MIL,
CHIEF, TITAN-style), and adapter/LoRA machinery. All modules are flax.linen,
consume padded bags with validity masks, and are vmap/pjit-friendly.
"""

from moc_tpu.models.senet import SENet

__all__ = ["SENet"]
