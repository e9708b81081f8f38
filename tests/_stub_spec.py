"""Shared helper: give sys.modules stubs a real __spec__.

A bare ``types.ModuleType`` has ``__spec__ = None``, which breaks OTHER
packages' ``importlib.util.find_spec`` probes later in the same pytest
process (transformers' lazy loader raised ``timm.__spec__ is None``)."""
import importlib.machinery
import sys


def ensure_spec(*names: str) -> None:
    for name in names:
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
