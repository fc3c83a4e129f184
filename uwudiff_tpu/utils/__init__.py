"""Misc utilities (parity with ``duwu/utils/__init__.py``)."""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Any, Iterator, Literal

import jax
import jax.numpy as jnp

from uwudiff_tpu.config import (  # noqa: F401  (re-export, as the reference does)
    get_obj_from_str,
    instantiate_any,
    instantiate_class,
)

__all__ = [
    "exists",
    "default",
    "remove_none",
    "count_params",
    "zero_module_init",
    "balance_sharding_index",
    "balance_sharding",
    "balance_sharding_max_size",
    "truncate_or_pad_to_length",
    "repeat_last",
    "cycling",
    "uniform_expansion",
    "get_uwu_logger",
    "setup_uwu_logger",
    "get_images_recursively",
    "append_dims",
    "apply_platform_env",
]


def apply_platform_env() -> None:
    """Honor a ``UWU_PLATFORM`` env var (e.g. ``cpu``) at the jax.config
    level, BEFORE the first backend touch.

    Needed because PJRT proxy plugins (the axon TPU tunnel here) ignore
    the ``JAX_PLATFORMS``/``JAX_PLATFORM_NAME`` env vars and initialize
    anyway — which hangs every CLI when the remote relay is unreachable.
    Call this first in every script ``main()``.
    """
    plat = os.environ.get("UWU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def exists(val: Any) -> bool:
    return val is not None


def default(val: Any, d: Any) -> Any:
    if val is not None:
        return val
    return d() if callable(d) else d


def remove_none(list_x: list) -> list:
    return [i for i in list_x if i is not None]


def count_params(params: Any, verbose: bool = False) -> int:
    """Total number of scalars in a parameter pytree
    (``duwu/utils/__init__.py:86-90``)."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"params: {total * 1e-6:.2f} M")
    return total


def zero_module_init(key, shape, dtype=jnp.float32, stddev: float = 1e-5):
    """Near-zero initializer for residual-adjacent layers.

    The reference zero-inits with ``normal(0, 1e-5)`` the out-projections of
    attention/FF/resblocks (``duwu/modules/unet_patch.py:34-45``); this is
    the flax initializer equivalent.
    """
    return jax.random.normal(key, shape, dtype) * stddev


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims (``sampling/k_diffusion_wrapper.py:5-15``)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(
            f"input has {x.ndim} dims but target_ndim is {target_ndim}"
        )
    return x[(...,) + (None,) * dims_to_append]


# --- data sharding helpers (``duwu/utils/__init__.py:97-116``) ---


def balance_sharding_index(total: int, shards: int) -> Iterator[tuple[int, int]]:
    prev = 0
    for _ in range(shards):
        this_shard = total // shards
        yield prev, this_shard
        shards -= 1
        total -= this_shard
        prev += this_shard


def balance_sharding(datas, shards: int):
    total = len(datas)
    for prev, this_shard in balance_sharding_index(total, shards):
        yield datas[prev : prev + this_shard]


def balance_sharding_max_size(datas, max_size: int):
    total = len(datas)
    shards = total // max_size + int(bool(total % max_size))
    return balance_sharding(datas, shards)


# --- prompt-list padding (``duwu/utils/__init__.py:119-152``) ---


def truncate_or_pad_to_length(
    list_x: list,
    target_length: int,
    padding_mode: Literal["repeat_last", "cycling", "uniform_expansion"],
) -> list:
    if len(list_x) > target_length:
        return list_x[:target_length]
    if len(list_x) == target_length:
        return list_x
    if padding_mode == "repeat_last":
        return repeat_last(list_x, target_length)
    if padding_mode == "cycling":
        return cycling(list_x, target_length)
    if padding_mode == "uniform_expansion":
        return uniform_expansion(list_x, target_length)
    raise ValueError(f"Unknown padding mode {padding_mode!r}")


def repeat_last(list_x: list, target_length: int) -> list:
    return list_x + [list_x[-1]] * (target_length - len(list_x))


def cycling(list_x: list, target_length: int) -> list:
    return (
        list_x * (target_length // len(list_x))
        + list_x[: target_length % len(list_x)]
    )


def uniform_expansion(list_x: list, target_length: int) -> list:
    result: list = []
    for idx, ref in enumerate(
        balance_sharding(list(range(target_length)), len(list_x))
    ):
        result.extend([list_x[idx]] * len(ref))
    return result


# --- logging (``duwu/utils/__init__.py:155-186``) ---


def get_uwu_logger() -> logging.Logger:
    return logging.getLogger("uwudiff_tpu")


def setup_uwu_logger(level: int = logging.DEBUG) -> logging.Logger:
    """Process-zero logger setup (multi-host: only host 0 emits)."""
    logger = get_uwu_logger()
    if jax.process_index() != 0:
        logger.addHandler(logging.NullHandler())
        return logger
    logger.setLevel(level)
    handler = logging.StreamHandler(sys.stdout)
    handler.setLevel(level)
    handler.setFormatter(
        logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(handler)
    return logger


def get_images_recursively(folder_path: str) -> list[str]:
    """Recursively list image files (``duwu/utils/__init__.py:189-225``)."""
    if not os.path.exists(folder_path):
        raise ValueError(f"The path {folder_path} does not exist.")
    allowed_patterns = [
        "*.[Pp][Nn][Gg]",
        "*.[Jj][Pp][Gg]",
        "*.[Jj][Pp][Ee][Gg]",
        "*.[Ww][Ee][Bb][Pp]",
        "*.[Gg][Ii][Ff]",
    ]
    return [
        str(path)
        for pattern in allowed_patterns
        for path in Path(folder_path).rglob(pattern)
    ]
