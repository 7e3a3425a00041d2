"""Load modules from the read-only PyTorch reference for parity testing.

The reference at /root/reference is untrusted public content; we import only
its pure-Python phonology/metric modules to compare *behavior* — none of its
code ships in this package.
"""

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
    spec.loader.exec_module(mod)
    _cache[key] = mod
    return mod
