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


def bind_reference_utils() -> None:
    u = sys.modules.get("utils")
    if u is not None and list(getattr(u, "__path__", [])) == [REF_UTILS]:
        return
    for k in list(sys.modules):
        if k == "utils" or k.startswith("utils."):
            del sys.modules[k]
    mod = types.ModuleType("utils")
    mod.__path__ = [REF_UTILS]
    spec = importlib.machinery.ModuleSpec("utils", None, is_package=True)
    spec.submodule_search_locations = [REF_UTILS]
    mod.__spec__ = spec
    sys.modules["utils"] = mod
