"""Load modules from the read-only PyTorch reference for parity testing.

The reference at /root/reference is untrusted public content; we import only
its pure-Python phonology/metric modules to compare *behavior* — none of its
code ships in this package.
"""

import importlib
import importlib.util
import os
import sys

REFERENCE_ROOT = "/root/reference"

_cache = {}


def load_reference_module(relpath: str, name: str):
    """Import a single file from the reference tree under a private name."""
    key = (relpath, name)
    if key in _cache:
        return _cache[key]
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(f"_ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    # reference files use absolute imports rooted at the reference tree
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    _cache[key] = mod
    return mod


def load_reference_package(dotted: str):
    """Import a reference module through the normal package machinery
    (needed for files that use relative imports)."""
    if dotted in _cache:
        return _cache[dotted]
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        mod = importlib.import_module(dotted)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    _cache[dotted] = mod
    return mod
