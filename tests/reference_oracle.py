"""Load the reference implementation (read-only, /root/reference) as an
importable oracle for bit-exactness tests.

The reference modules import each other through the package path
``yolov8n_quantisation.quantisation.utils.*``; we synthesize that package
in sys.modules and execute the leaf modules straight from the mounted tree.
Nothing is copied into this repository — the oracle exists only at test time
and tests depending on it skip when the mount is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = "/root/reference/quantisation"
_PKG = "yolov8n_quantisation"


def _ensure_pkg(name: str, path: str | None = None):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
    if path is not None and path not in sys.modules[name].__path__:
        # real search path so stage scripts' `from ...utils.X import *`
        # resolve submodules through the normal import machinery
        sys.modules[name].__path__.append(path)
    return sys.modules[name]


# Leaves with no intra-package imports, loaded eagerly so that
# ``from yolov8n_quantisation...utils.X import *`` inside other reference
# modules resolves from sys.modules.
_BASE_LEAVES = ("stage_0", "utils.scale", "utils.a", "utils.clip")


def load(leaf: str, fresh: bool = False):
    """Load e.g. 'utils.rescale_coeff' from the reference tree.

    fresh=True drops any cached module first and re-executes the script
    — needed for the stage scripts, which run their whole pipeline at
    import time (a second execution in the same process would otherwise
    silently no-op off the sys.modules cache)."""
    _ensure_pkg(_PKG)
    _ensure_pkg(f"{_PKG}.quantisation", REF)
    _ensure_pkg(f"{_PKG}.quantisation.utils", os.path.join(REF, "utils"))
    if leaf not in _BASE_LEAVES:
        for base in _BASE_LEAVES:
            load(base)
    fullname = f"{_PKG}.quantisation.{leaf}"
    if fresh:
        sys.modules.pop(fullname, None)
    if fullname in sys.modules:
        return sys.modules[fullname]
    path = os.path.join(REF, leaf.replace(".", "/") + ".py")
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod
