"""YAML config loading.

The reference loads raw YAML into a `yacs.CfgNode` with attribute access and
no schema (`/root/reference/config/config.py:4-5`). We keep the exact same
key names so reference YAML presets load unmodified, but use a small
dependency-free attribute-dict plus explicit defaults for keys the code
reads, which yacs never provided.
"""

from __future__ import annotations

from typing import Any, Mapping

import yaml


class Config(dict):
    """Attribute-access dict (recursive). ``cfg.LR``, ``cfg.get('SAVE', True)``."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = Config(v) if isinstance(v, Mapping) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(f"Config has no key {name!r}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def clone(self) -> "Config":
        out = Config()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, Config) else v
        return out

    def require(self, *keys: str) -> None:
        """Fail fast with ALL missing keys named (the reference's yacs config
        would surface one cryptic AttributeError deep in an executor)."""
        missing = [k for k in keys if k not in self or self[k] is None]
        if missing:
            raise ValueError(
                f"config is missing required key(s) {missing} — add them to "
                f"the YAML preset (see configs/ for complete examples)"
            )


# Defaults for keys that executors read but some reference YAMLs omit.
# (yacs would raise; the reference relies on every YAML carrying them.)
_DEFAULTS: dict[str, Any] = {
    "DEVICE": "tpu",
    "SAVE": True,
    "NUM_FREEZE_EPOCH": 0,
    "get_predict_score": False,
    "NUMWORKERS": 0,
    "SEED": 13,
    "DTYPE": "bfloat16",  # TPU-native compute dtype (new key; MXU-friendly)
}


def get_config(yaml_file: str) -> Config:
    """Load a YAML preset into a Config. Same call shape as the reference
    `get_config` (`/root/reference/config/config.py:4-5`)."""
    with open(yaml_file, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config(_DEFAULTS)
    for k, v in Config(raw).items():
        cfg[k] = v
    return cfg
