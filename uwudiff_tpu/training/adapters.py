"""LoRA / LoKr adapters as pure parameter-tree transforms.

Capability parity with the reference's LyCORIS integration
(``duwu/trainer/trainer.py:148-215``, preset
``configs/lycoris/sdxl-diffusers.toml``): wrap the UNet's linear layers
with low-rank (LoRA) or Kronecker-product (LoKr) deltas, train only the
adapter params, merge back into the base for inference, and export the
adapter subtree alone.

TPU-first design (SURVEY.md §7.2 item 7): instead of module monkey-
patching, adapters are a *separate pytree* plus a pure
``merge(base, adapter) -> base'`` function traced into the train step.
GSPMD shards the merged weights exactly like the base ones, and
``merge_to`` for inference is the same function run once.

Config parity: ``build_adapter_config`` accepts the reference's LyCORIS
TOML layout ({config: {algo, linear_dim, linear_alpha, factor}, preset:
{target_module, module_algo_map}}); module-class names map onto param-
path regexes of our UNet (Attention -> attn blocks, FeedForward -> ff).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AdapterConfig", "LycorisAdapter", "build_adapter_config"]

# reference module-class names -> param-path regexes in our models
_MODULE_NAME_PATTERNS = {
    "Attention": r".*attn\d/(to_q|to_k|to_v|to_qkv|to_kv|to_out)/kernel$",
    "FeedForward": r".*/ff/(proj_in|proj_out)/kernel$",
    "Transformer2DModel": r".*(attn|blocks_|proj_in|proj_out).*kernel$",
}


@dataclasses.dataclass(frozen=True)
class AdapterTarget:
    pattern: str
    algo: str = "lora"  # "lora" | "lokr"
    dim: int = 4  # lora rank
    alpha: float = 1.0
    factor: int = -1  # lokr kronecker factor (-1 -> auto sqrt)


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    targets: tuple[AdapterTarget, ...]
    multiplier: float = 1.0
    enable_conv: bool = False


def build_adapter_config(cfg: dict | str) -> AdapterConfig:
    """Accept a LyCORIS-style dict/TOML path or a native config dict."""
    if isinstance(cfg, str):
        import tomllib

        with open(cfg, "rb") as f:
            cfg = tomllib.load(f)
    if "targets" in cfg:  # native format
        targets = tuple(
            t if isinstance(t, AdapterTarget) else AdapterTarget(**t)
            for t in cfg["targets"]
        )
        return AdapterConfig(
            targets=targets,
            multiplier=cfg.get("multiplier", 1.0),
            enable_conv=cfg.get("enable_conv", False),
        )

    # LyCORIS layout
    conf = cfg.get("config", {})
    preset = cfg.get("preset", {})
    base_algo = conf.get("algo", "lora")
    dim = int(conf.get("linear_dim", 4))
    alpha = float(conf.get("linear_alpha", 1.0))
    targets: list[AdapterTarget] = []
    # per-module-class overrides first (more specific wins)
    for mod_name, mod_cfg in preset.get("module_algo_map", {}).items():
        pattern = _MODULE_NAME_PATTERNS.get(mod_name, f".*{mod_name}.*kernel$")
        targets.append(
            AdapterTarget(
                pattern=pattern,
                algo=mod_cfg.get("algo", base_algo),
                dim=int(mod_cfg.get("dim", dim)),
                alpha=float(mod_cfg.get("alpha", alpha)),
                factor=int(mod_cfg.get("factor", -1)),
            )
        )
    # default targets: every linear kernel inside target_module scopes
    for mod_name in preset.get("target_module", []) or [".*"]:
        pattern = _MODULE_NAME_PATTERNS.get(mod_name, f".*{mod_name}.*kernel$")
        targets.append(AdapterTarget(pattern=pattern, algo=base_algo, dim=dim,
                                     alpha=alpha))
    return AdapterConfig(
        targets=tuple(targets),
        multiplier=float(conf.get("multiplier", 1.0)),
        enable_conv=bool(preset.get("enable_conv", False)),
    )


def _factorization(n: int, factor: int = -1) -> tuple[int, int]:
    """LoKr dimension factorization (LyCORIS semantics): n = a*b with
    a <= b; factor=-1 -> closest to sqrt; else a = gcd-ish fit to factor."""
    if factor > 0:
        a = math.gcd(n, factor)
        # prefer exactly `factor` when divisible
        if n % factor == 0:
            a = factor
        return min(a, n // a), max(a, n // a)
    a = int(math.isqrt(n))
    while n % a != 0:
        a -= 1
    return min(a, n // a), max(a, n // a)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key) if key is not None else str(p))
    return "/".join(parts)


class LycorisAdapter:
    """Holds static per-target specs + the adapter param pytree."""

    def __init__(self, specs: dict[str, dict], params: dict[str, Any],
                 multiplier: float = 1.0):
        self.specs = specs  # path -> {"algo", "alpha", "dim"/"factor", shape}
        self.params = params  # path -> adapter leaves
        self.multiplier = multiplier

    # ------------------------------------------------------------------

    @classmethod
    def create(cls, module, base_params, config: AdapterConfig, rng):
        """Scan the base param tree; attach adapters to matching 2D
        kernels (conv kernels if enable_conv, and the ndim-3 stacked
        kernels of ``scan_transformer_blocks=True`` models — those get
        per-layer adapters batched over the leading layer axis)."""
        flat = jax.tree_util.tree_flatten_with_path(base_params)[0]
        specs: dict[str, dict] = {}
        params: dict[str, Any] = {}
        keys = jax.random.split(rng, max(len(flat), 1))
        for (path, leaf), key in zip(flat, keys):
            name = _path_str(path)
            if not name.endswith("kernel"):
                continue
            stack = ()  # leading layer axis of nn.scan-stacked kernels
            if leaf.ndim == 2:
                in_dim, out_dim = leaf.shape
            elif leaf.ndim == 3:
                stack = (leaf.shape[0],)
                in_dim, out_dim = leaf.shape[1:]
            elif leaf.ndim == 4 and config.enable_conv:
                kh, kw, cin, out_dim = leaf.shape
                in_dim = kh * kw * cin
            else:
                continue
            target = next(
                (t for t in config.targets if re.match(t.pattern, name)), None
            )
            if target is None:
                continue
            specs[name] = {
                "algo": target.algo,
                "alpha": target.alpha,
                "dim": target.dim,
                "factor": target.factor,
                "shape": tuple(leaf.shape),
                "stack": stack,
            }
            if target.algo == "lora":
                k1, _ = jax.random.split(key)
                params[name] = {
                    "lora_down": jax.random.normal(
                        k1, (*stack, in_dim, target.dim)
                    )
                    * (1.0 / max(in_dim, 1)) ** 0.5,
                    "lora_up": jnp.zeros((*stack, target.dim, out_dim)),
                }
            elif target.algo == "lokr":
                i1, i2 = _factorization(in_dim, target.factor)
                o1, o2 = _factorization(out_dim, target.factor)
                k1, _ = jax.random.split(key)
                params[name] = {
                    # kron(w1, w2): w2 zero-init keeps the delta at 0
                    "lokr_w1": jax.random.normal(k1, (*stack, i1, o1))
                    * (1.0 / max(i1, 1)) ** 0.5,
                    "lokr_w2": jnp.zeros((*stack, i2, o2)),
                }
            else:
                raise ValueError(f"Unknown adapter algo {target.algo!r}")
        return cls(specs, params, multiplier=config.multiplier)

    # ------------------------------------------------------------------

    def _delta(self, name: str) -> jnp.ndarray:
        spec = self.specs[name]
        p = self.params[name]
        if spec["algo"] == "lora":
            scale = spec["alpha"] / spec["dim"]
            # @ batches over any leading stack axis
            delta = (p["lora_down"] @ p["lora_up"]) * scale
        elif spec.get("stack"):
            # batched Kronecker over the layer axis:
            # kron(a, b)[i*P+p, j*Q+q] = a[i,j] * b[p,q]
            w1, w2 = p["lokr_w1"], p["lokr_w2"]
            (i1, o1), (i2, o2) = w1.shape[1:], w2.shape[1:]
            delta = (
                jnp.einsum("lio,lpq->lipoq", w1, w2).reshape(
                    w1.shape[0], i1 * i2, o1 * o2
                )
                * spec["alpha"]
            )
        else:  # lokr
            delta = jnp.kron(p["lokr_w1"], p["lokr_w2"]) * spec["alpha"]
        return (delta * self.multiplier).reshape(spec["shape"])

    def merge(self, base_params, adapter_params=None):
        """Pure merge: base + delta for every adapted kernel
        (``lycoris.merge_to`` parity, ``trainer.py:184-187``)."""
        if adapter_params is not None:
            self = LycorisAdapter(self.specs, adapter_params, self.multiplier)

        def fix(path, leaf):
            name = _path_str(path)
            if name in self.specs:
                return leaf + self._delta(name).astype(leaf.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(fix, base_params)

    # ------------------------------------------------------------------

    def save(self, path: str):
        """Adapter-only export (``trainer.py:189-215``)."""
        flat = {}
        for name, leaves in self.params.items():
            for k, v in leaves.items():
                flat[f"{name}::{k}"] = np.asarray(v)
        np.savez(path, **flat)

    def load(self, path: str) -> "LycorisAdapter":
        data = np.load(path)
        params = {name: dict(leaves) for name, leaves in self.params.items()}
        for key in data.files:
            name, k = key.split("::")
            params[name][k] = jnp.asarray(data[key])
        return LycorisAdapter(self.specs, params, self.multiplier)

    def n_params(self) -> int:
        return sum(
            int(np.prod(v.shape))
            for leaves in self.params.values()
            for v in leaves.values()
        )
