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
import inspect
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
        child = node.get(k)
        if child is None:
            # traversing through a `key: null` (shipped configs use
            # `mesh: null`): materialize a mapping so the override applies
            child = {}
            node[k] = child
        elif not isinstance(child, dict):
            # a scalar/list intermediate means the dotted path is a typo
            # (e.g. --trainer.max_steps.typo); replacing it would silently
            # destroy the original value — fail loudly instead
            raise ConfigError(
                f"cannot apply override {dotted!r}: {k!r} holds a "
                f"{type(child).__name__}, not a mapping"
            )
        node = child
    node[keys[-1]] = value


# --- strict validation (LightningCLI/jsonargparse parity) -------------------
#
# The reference CLI rejects unknown keys anywhere in the config tree
# (/root/reference/src/dmme/trainer.py:9 — jsonargparse validates every
# init_args name against the target constructor's signature). Same contract
# here: a typo'd ``trainer.max_step`` or ``model.init_args.leraning_rate``
# fails loudly at parse time, before any device work.

TOP_LEVEL_KEYS = frozenset(
    {"seed_everything", "trainer", "model", "data", "ckpt_path"}
)

TRAINER_KEYS = frozenset({
    # fit
    "max_steps", "log_every_n_steps", "ckpt_every_n_steps",
    "default_root_dir", "accumulate_grad_batches", "mesh", "callbacks",
    "resume", "max_restarts", "steps_per_call", "detect_anomaly",
    "ckpt_max_to_keep", "ckpt_step",
    "tensorboard", "loggers",
    # evaluate / sample / predict / serve
    "limit_test_batches", "limit_val_batches", "limit_predict_batches",
    "inception_weights", "fid_stats", "save_fid_stats", "use_ema",
    "sampler", "sample_steps", "refresh_interval", "cache_depth",
    "img_size", "sample_batch", "predict_batch", "host", "port",
})

MESH_KEYS = frozenset({"data", "fsdp", "tensor", "spatial", "expert"})


class ConfigError(ValueError):
    """Unknown key / bad structure in a config tree."""


def _fail_unknown(unknown, where: str, known) -> None:
    raise ConfigError(
        f"unknown key(s) {sorted(unknown)} in {where}; "
        f"known keys: {sorted(known)}"
    )


def validate_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Reject unknown keys everywhere in the tree; returns config."""
    if not isinstance(config, dict):
        raise ConfigError(f"config root must be a mapping, got {type(config)}")
    unknown = set(config) - TOP_LEVEL_KEYS
    if unknown:
        _fail_unknown(unknown, "top-level config", TOP_LEVEL_KEYS)
    trainer = config.get("trainer") or {}
    if not isinstance(trainer, dict):
        raise ConfigError("trainer: must be a mapping")
    unknown = set(trainer) - TRAINER_KEYS
    if unknown:
        _fail_unknown(unknown, "trainer:", TRAINER_KEYS)
    mesh = trainer.get("mesh") or {}
    if mesh:
        if not isinstance(mesh, dict):
            raise ConfigError("trainer.mesh: must be a mapping of axis sizes")
        unknown = set(mesh) - MESH_KEYS
        if unknown:
            _fail_unknown(unknown, "trainer.mesh:", MESH_KEYS)
    for slot in ("model", "data"):
        if config.get(slot) is not None:
            if not isinstance(config[slot], dict) or "class_path" not in config[slot]:
                raise ConfigError(
                    f"{slot}: must be a mapping with a class_path "
                    f"(got {type(config[slot]).__name__})"
                )
            _validate_class_tree(config[slot], slot)
    for slot in ("callbacks", "loggers"):
        nodes = trainer.get(slot)
        if nodes is None:
            continue
        if not isinstance(nodes, list):
            raise ConfigError(
                f"trainer.{slot}: must be a LIST of class_path entries "
                f"(got {type(nodes).__name__})"
            )
        for i, node in enumerate(nodes):
            if not isinstance(node, dict) or "class_path" not in node:
                # a bare string entry would pass through instantiate()
                # unconstructed and the callback/logger silently never run
                raise ConfigError(
                    f"trainer.{slot}[{i}]: must be a mapping with a "
                    f"class_path (got {type(node).__name__})"
                )
            _validate_class_tree(node, f"trainer.{slot}[{i}]")
    return config


def _validate_class_tree(node: Any, where: str) -> None:
    if isinstance(node, dict):
        if "class_path" in node:
            extra = set(node) - {"class_path", "init_args"}
            if extra:
                _fail_unknown(extra, where, {"class_path", "init_args"})
            cls = resolve_class(node["class_path"])  # loud on bad path
            init_args = node.get("init_args") or {}
            if not isinstance(init_args, dict):
                raise ConfigError(f"{where}.init_args must be a mapping")
            _check_signature(cls, init_args, where)
            for k, v in init_args.items():
                _validate_class_tree(v, f"{where}.init_args.{k}")
        else:
            for k, v in node.items():
                _validate_class_tree(v, f"{where}.{k}")
    elif isinstance(node, list):
        for i, v in enumerate(node):
            _validate_class_tree(v, f"{where}[{i}]")


def _check_signature(cls, init_args: Dict[str, Any], where: str) -> None:
    try:
        sig = inspect.signature(cls)
    except (TypeError, ValueError):  # C-implemented / no signature
        return
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return  # **kwargs constructors accept anything by design
    unknown = set(init_args) - set(params)
    if unknown:
        _fail_unknown(
            unknown, f"{where}.init_args for {cls.__name__}", set(params)
        )


def describe_class(class_path: str) -> str:
    """One line per constructor arg — the CLI's introspective ``--help``
    body (mirrors jsonargparse's signature-derived flag listing)."""
    cls = resolve_class(class_path)
    try:
        sig = inspect.signature(cls)
    except (TypeError, ValueError):
        return f"{class_path}: (no introspectable signature)"
    lines = [f"{class_path}:"]
    for name, p in sig.parameters.items():
        if p.kind in (inspect.Parameter.VAR_POSITIONAL,
                      inspect.Parameter.VAR_KEYWORD):
            lines.append(f"  {p}")
            continue
        ann = "" if p.annotation is inspect.Parameter.empty \
            else f": {inspect.formatannotation(p.annotation)}"
        default = "  (required)" if p.default is inspect.Parameter.empty \
            else f" = {p.default!r}"
        lines.append(f"  {name}{ann}{default}")
    return "\n".join(lines)
