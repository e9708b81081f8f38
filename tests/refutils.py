"""Deterministic binding of the reference's ``utils`` namespace package.

``/root/reference/utils`` has no ``__init__.py`` (a namespace package), and
``/root/reference/models/musk/utils.py`` is a regular MODULE of the same
name — when the torchscale oracle fixtures put ``models/musk`` at
``sys.path[0]`` earlier in a suite run, a later ``from utils import
lora_utils`` silently resolves the musk module and fails (regular modules
beat namespace packages). This caused order-dependent failures only in the
FULL gate, never standalone. The fix: bind ``sys.modules["utils"]`` to an
explicit namespace-package module rooted at the reference ``utils`` dir,
evicting any shadow first. Nothing in the reference imports the musk
``utils.py`` as top-level ``utils`` (grep-verified), so the rebind is safe.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REF_UTILS = "/root/reference/utils"
REF_MODELS = "/root/reference/models"


def _bind_namespace(name: str, root: str) -> None:
    mod = sys.modules.get(name)
    if mod is not None and list(getattr(mod, "__path__", [])) == [root]:
        return
    for k in list(sys.modules):
        if k == name or k.startswith(name + "."):
            del sys.modules[k]
    mod = types.ModuleType(name)
    mod.__path__ = [root]
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    spec.submodule_search_locations = [root]
    mod.__spec__ = spec
    sys.modules[name] = mod


def bind_reference_utils() -> None:
    _bind_namespace("utils", REF_UTILS)
    # `models` suffers the same fate: the musk tree contains a `models`
    # DATA dir (tokenizer.spm) that can poison the merged namespace path
    # depending on which oracle fixture ran first
    _bind_namespace("models", REF_MODELS)
