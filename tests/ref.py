"""Import helper for the PyTorch reference at /root/reference.

Used by parity tests as the oracle (the reference's own test strategy —
golden parity against a trusted implementation, SURVEY section 4).  The
reference tree is read-only and never copied; we instantiate its modules,
ingest their state_dicts through our generic torch interop, and compare
outputs.
"""

import importlib
import os
import sys

REFERENCE_PATH = "/root/reference"

_loaded = {}


def load(module_name: str):
    """Import a module from the reference tree (e.g. 'models.unet.unet')."""
    if module_name in _loaded:
        return _loaded[module_name]
    # APPEND (not insert-0): the reference tree has top-level inference.py /
    # evaluation.py etc. that must not shadow ours for the CLI tests
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
    mod = importlib.import_module(module_name)
    _loaded[module_name] = mod
    return mod


def available() -> bool:
    return os.path.isdir(REFERENCE_PATH)
