"""YAML config system — class_path/init_args dependency injection.

Mirrors the reference's LightningCLI/jsonargparse behavior (SURVEY.md §5):
"config instantiates arbitrary class trees" — any mapping with a
``class_path`` key is resolved via importlib and constructed with its
(recursively instantiated) ``init_args``; dotted CLI overrides
(``--model.init_args.lr 1e-4``) rewrite the tree before instantiation.
Reference YAMLs (configs/ddpm/cifar10.yaml:72-84) translate 1:1.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional

import yaml

_DTYPE_ALIASES = {
    "bf16": "bfloat16",
    "fp32": "float32",
    "f32": "float32",
    "fp16": "float16",
}


def resolve_class(class_path: str):
    module, _, name = class_path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate(node: Any) -> Any:
    """Recursively instantiate ``{class_path, init_args}`` nodes."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls = resolve_class(node["class_path"])
            kwargs = {k: instantiate(v) for k, v in node.get("init_args", {}).items()}
            return cls(**_canon_kwargs(kwargs))
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def _canon_kwargs(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(kwargs)
    if isinstance(out.get("dtype"), str):
        import jax.numpy as jnp

        name = _DTYPE_ALIASES.get(out["dtype"], out["dtype"])
        out["dtype"] = jnp.dtype(name)
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def apply_overrides(config: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``key.path=value`` / ``--key.path value`` style overrides."""
    i = 0
    while i < len(overrides):
        item = overrides[i]
        if item.startswith("--"):
            item = item[2:]
        if "=" in item:
            key, value = item.split("=", 1)
            i += 1
        else:
            key = item
            i += 1
            if i >= len(overrides):
                raise ValueError(f"missing value for override {key!r}")
            value = overrides[i]
            i += 1
        _set_dotted(config, key, _parse_value(value))
    return config


def _parse_value(text: str) -> Any:
    value = yaml.safe_load(text)
    if isinstance(value, str):
        # YAML 1.1 doesn't resolve "2e-4"-style floats; be forgiving.
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def _set_dotted(config: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = config
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value
