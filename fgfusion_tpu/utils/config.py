"""Configuration handling.

Keeps the reference's YAML schema: a config file contains top-level
sections (general / dataset / train_options / solver / kpconv_options /
model / losses / validation) whose keys are flattened into a single flat
namespace (reference: utils/misc.py:10-29). Duplicate keys across
sections silently override, matching the reference behaviour (later
sections win).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """Flat dict with attribute access (EasyDict-like, stdlib only)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, key, default=None):  # keep dict.get semantics
        return super().get(key, default)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))


def load_config(path: str) -> Config:
    """Load a YAML config, flattening one level of section nesting.

    Mirrors reference `utils/misc.py:load_config`: each top-level value
    that is a dict gets its items merged into the flat output; scalar
    top-level keys are kept as-is.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return flatten_config(raw)


def flatten_config(raw: Optional[Dict[str, Any]]) -> Config:
    cfg = Config()
    if raw is None:
        return cfg
    for key, value in raw.items():
        if isinstance(value, dict):
            for k, v in value.items():
                cfg[k] = v
        else:
            cfg[key] = value
    return cfg


def save_config(cfg_path_or_cfg, out_path: str) -> None:
    """Archive a config into the log dir (reference train.py:74-77)."""
    if isinstance(cfg_path_or_cfg, str):
        with open(cfg_path_or_cfg) as f:
            text = f.read()
        with open(out_path, "w") as f:
            f.write(text)
    else:
        with open(out_path, "w") as f:
            yaml.safe_dump(dict(cfg_path_or_cfg), f)
