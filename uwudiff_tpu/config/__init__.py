"""Config & object-instantiation system.

Capability parity with the reference's OmegaConf/hydra spine
(``duwu/utils/__init__.py:17-50``, ``test_scripts/test_train.py:23-33``)
without the omegaconf/hydra dependencies: multi-file YAML/TOML overlay
merge plus dual-format object instantiation:

1. hydra format: ``{"_target_": "pkg.mod.Cls", "_partial_": bool,
   "_recursive_": bool, **kwargs}``
2. custom format: ``{"class": "pkg.mod.Cls", "factory": "from_config",
   "args": [...], "kwargs": {...}}``
"""

from __future__ import annotations

import functools
import importlib
from pathlib import Path
from typing import Any

__all__ = [
    "get_obj_from_str",
    "instantiate_class",
    "instantiate_any",
    "merge_configs",
    "load_config_files",
]

_RESERVED = ("_target_", "_partial_", "_recursive_", "_args_")


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve a dotted path ``pkg.mod.Attr`` to a Python object.

    Mirrors ``duwu/utils/__init__.py:17-22``. Walks attributes right-to-left
    so nested attributes (``pkg.mod.Cls.method``) also resolve.
    """
    parts = string.split(".")
    # Find the longest importable module prefix.
    for i in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:i])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        if reload:
            module = importlib.reload(module)
        obj = module
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"Could not resolve object path: {string!r}")


def _is_mapping(obj: Any) -> bool:
    return isinstance(obj, dict)


def instantiate_hydra(obj: dict, _recursive_: bool = True) -> Any:
    """Instantiate a hydra-format node (``_target_`` et al.)."""
    cfg = dict(obj)
    target = cfg.pop("_target_")
    partial = bool(cfg.pop("_partial_", False))
    recursive = bool(cfg.pop("_recursive_", _recursive_))
    pos_args = cfg.pop("_args_", [])

    factory = get_obj_from_str(target) if isinstance(target, str) else target

    if recursive:
        pos_args = [_instantiate_recursive(a) for a in pos_args]
        kwargs = {k: _instantiate_recursive(v) for k, v in cfg.items()}
    else:
        kwargs = cfg

    if partial:
        return functools.partial(factory, *pos_args, **kwargs)
    return factory(*pos_args, **kwargs)


def _instantiate_recursive(obj: Any) -> Any:
    if _is_mapping(obj):
        if "_target_" in obj:
            return instantiate_hydra(obj)
        return {k: _instantiate_recursive(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_instantiate_recursive(v) for v in obj)
    return obj


def instantiate_class(obj: Any) -> Any:
    """Custom-format instantiation (``duwu/utils/__init__.py:25-38``).

    ``{"class": path, "factory": name, "args": [...], "kwargs": {...}}``;
    a bare string resolves to the object itself; everything else passes
    through unchanged.
    """
    if _is_mapping(obj) and "class" in obj:
        cfg = dict(obj)
        obj_factory = instantiate_class(cfg.pop("class"))
        if "factory" in cfg:
            obj_factory = getattr(obj_factory, cfg.pop("factory"))
        if "args" in cfg or "kwargs" in cfg:
            return obj_factory(*cfg.get("args", []), **cfg.get("kwargs", {}))
        return obj_factory(**cfg)
    if isinstance(obj, str):
        return get_obj_from_str(obj)
    return obj


def instantiate_any(obj: Any) -> Any:
    """Instantiate either config format (``duwu/utils/__init__.py:41-50``)."""
    if _is_mapping(obj) and "_target_" in obj:
        return instantiate_hydra(obj)
    return instantiate_class(obj)


def merge_configs(*configs: dict) -> dict:
    """Deep-merge mappings left-to-right (later overrides earlier).

    Equivalent to ``OmegaConf.merge`` over plain dicts
    (``test_scripts/test_train.py:23-33``). Lists are replaced, not
    concatenated, matching OmegaConf semantics.
    """
    result: dict = {}
    for cfg in configs:
        result = _merge_two(result, cfg)
    return result


def _merge_two(base: Any, override: Any) -> Any:
    if _is_mapping(base) and _is_mapping(override):
        out = dict(base)
        for k, v in override.items():
            out[k] = _merge_two(out[k], v) if k in out else v
        return out
    return override


def load_config_file(path: str | Path) -> dict:
    """Load one YAML or TOML config file into a plain dict."""
    path = Path(path)
    if path.suffix in (".yaml", ".yml"):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f) or {}
    if path.suffix == ".toml":
        import tomllib

        with open(path, "rb") as f:
            return tomllib.load(f)
    raise ValueError(f"Unsupported config format: {path}")


def load_config_files(paths: list[str | Path]) -> dict:
    """Load and overlay-merge multiple config files in order."""
    return merge_configs(*(load_config_file(p) for p in paths))
