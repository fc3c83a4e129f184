"""kohya-ss / A1111 LoRA file format: import + export.

Community LoRA files (civitai, A1111 ``models/Lora``, ComfyUI
``loras/``) ship as one ``.safetensors`` whose keys follow kohya-ss
sd-scripts naming: the diffusers module path with dots flattened to
underscores under a network prefix —

    lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q
        .lora_down.weight   [rank, in]
        .lora_up.weight     [out, rank]
        .alpha              scalar (delta scale = alpha / rank)

(TE towers use ``lora_te_`` for SD1.x and ``lora_te1_``/``lora_te2_``
for SDXL; conv LoRAs — LoCon — store ``lora_down`` as a conv tensor
``[r, cin, kh, kw]``.)

The reference ecosystem reads/writes this via LyCORIS + sd-scripts;
here it converts to/from :class:`~uwudiff_tpu.training.adapters.
LycorisAdapter` (adapters as pure pytree transforms), so a downloaded
LoRA drops straight into ``Txt2ImgPipeline.register_adapter`` /
``merge`` and trained adapters publish back to the A1111/ComfyUI
world. The module-name bridge reuses the importer key maps
(our flax path -> diffusers key -> kohya name), so every model the
importer covers is covered here too, including ``nn.scan``-stacked
blocks (stacked adapter leaves unroll to per-layer kohya entries and
back).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

from uwudiff_tpu.models.import_torch import (
    _SCAN_STACK_RE,
    _t_conv,
    _t_linear,
    _unroll_path,
    unet_key_map,
)

# kohya LoRA deltas compose with the BASE kernel's layout only when the
# key map's transform is a plain linear transpose, a conv OIHW->HWIO, or
# the proj conv1x1/linear dual ("proj"). Anything else (e.g. mmdit's
# norm_out swap-halves) would round-trip deltas with silently permuted
# rows — those layers are not kohya-addressable and must be skipped.
_KOHYA_SAFE_TRANSFORMS = (_t_linear, _t_conv, "proj", None)
from uwudiff_tpu.training.adapters import LycorisAdapter, _path_str

__all__ = [
    "kohya_module_name",
    "export_kohya_lora",
    "save_kohya_lora",
    "import_kohya_lora",
    "load_kohya_lora",
]


def kohya_module_name(diffusers_key: str, prefix: str = "lora_unet") -> str:
    """diffusers weight key -> kohya module name
    (``down_blocks.0...to_q.weight`` ->
    ``lora_unet_down_blocks_0...to_q``)."""
    mod = diffusers_key
    if mod.endswith(".weight"):
        mod = mod[: -len(".weight")]
    # diffusers to_out is a ModuleList (to_out.0); kohya keeps the index
    return prefix + "_" + mod.replace(".", "_")


def _module_table(
    base_params: Any,
    key_map: Callable = unet_key_map,
    prefix: str = "lora_unet",
) -> dict[str, tuple[str, int | None]]:
    """{kohya module name: (our path, layer index | None)} for every
    adapter-eligible kernel in a base param tree. Stacked (ndim-3)
    kernels contribute one entry per layer index."""
    table: dict[str, tuple[str, int | None]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(base_params)[0]:
        name = _path_str(path)
        if not name.endswith("kernel") or leaf.ndim not in (2, 3, 4):
            continue
        if _SCAN_STACK_RE.search(name) and leaf.ndim >= 3:
            for i in range(int(leaf.shape[0])):
                try:
                    torch_key, tr = key_map(_unroll_path(name, i))
                except KeyError:
                    break
                if isinstance(torch_key, (list, tuple)):
                    continue  # fused qkv has no kohya convention
                if not _kohya_safe(tr):
                    continue  # layout-permuting transform (see above)
                table[kohya_module_name(torch_key, prefix)] = (name, i)
            continue
        try:
            torch_key, tr = key_map(name)
        except KeyError:
            continue
        if isinstance(torch_key, (list, tuple)):
            continue
        if not _kohya_safe(tr):
            continue
        table[kohya_module_name(torch_key, prefix)] = (name, None)
    return table


def _kohya_safe(tr) -> bool:
    import functools

    if isinstance(tr, functools.partial):
        tr = tr.func
    return tr in _KOHYA_SAFE_TRANSFORMS


# ---------------------------------------------------------------------
# export
# ---------------------------------------------------------------------


def export_kohya_lora(
    adapter: LycorisAdapter,
    base_params: Any,
    key_map: Callable = unet_key_map,
    prefix: str = "lora_unet",
    dtype=np.float32,
) -> dict[str, np.ndarray]:
    """A trained LoRA adapter -> flat kohya-format state dict.

    Our leaves are ``lora_down [in, r]`` / ``lora_up [r, out]``
    (matmul layout); kohya stores the torch Linear layout
    ``[r, in]`` / ``[out, r]`` — a transpose each. Stacked leaves
    ``[L, ...]`` export one kohya module per layer. LoKr targets have
    no kohya-LoRA encoding and raise."""
    inv: dict[tuple[str, int | None], str] = {
        v: k for k, v in _module_table(base_params, key_map, prefix).items()
    }
    out: dict[str, np.ndarray] = {}

    def emit(mod: str, down: np.ndarray, up: np.ndarray, alpha: float,
             conv_shape=None):
        if conv_shape is not None:
            kh, kw, cin, _ = conv_shape
            r = down.shape[1]
            # ours: [kh*kw*cin, r] flattened in (kh, kw, cin) order;
            # kohya conv lora_down: [r, cin, kh, kw]
            down = down.reshape(kh, kw, cin, r).transpose(3, 2, 0, 1)
            up = up.T[:, :, None, None]  # [out, r, 1, 1]
        else:
            down, up = down.T, up.T
        out[mod + ".lora_down.weight"] = np.ascontiguousarray(
            down.astype(dtype))
        out[mod + ".lora_up.weight"] = np.ascontiguousarray(up.astype(dtype))
        out[mod + ".alpha"] = np.asarray(alpha, dtype=dtype)

    for name, leaves in adapter.params.items():
        spec = adapter.specs[name]
        if spec["algo"] != "lora":
            raise ValueError(
                f"{name}: algo {spec['algo']!r} has no kohya-LoRA "
                f"encoding (export LyCORIS algos via their own format)"
            )
        conv_shape = spec["shape"] if len(spec["shape"]) == 4 else None
        down = np.asarray(leaves["lora_down"], np.float32)
        up = np.asarray(leaves["lora_up"], np.float32)
        if spec.get("stack"):
            for i in range(spec["stack"][0]):
                mod = inv.get((name, i))
                if mod is None:
                    raise KeyError(f"no kohya name for {name}[{i}]")
                emit(mod, down[i], up[i], spec["alpha"], conv_shape)
        else:
            mod = inv.get((name, None))
            if mod is None:
                raise KeyError(f"no kohya name for {name}")
            emit(mod, down, up, spec["alpha"], conv_shape)
    return out


def save_kohya_lora(adapter, base_params, path: str, **kw) -> None:
    """Write a kohya-format ``.safetensors`` LoRA file."""
    from safetensors.numpy import save_file

    save_file(export_kohya_lora(adapter, base_params, **kw), path)


# ---------------------------------------------------------------------
# import
# ---------------------------------------------------------------------


def import_kohya_lora(
    sd: dict[str, np.ndarray],
    base_params: Any,
    key_map: Callable = unet_key_map,
    prefix: str = "lora_unet",
    multiplier: float = 1.0,
    strict: bool = True,
) -> LycorisAdapter:
    """A kohya-format state dict -> :class:`LycorisAdapter` against a
    base param tree (ranks/alphas read from the file per module).

    ``strict=False`` skips file modules that target layers absent from
    the base tree (e.g. the ``lora_te_`` towers when importing the
    UNet part only — filter by ``prefix`` first for that case)."""
    table = _module_table(base_params, key_map, prefix)
    shapes = {
        _path_str(p): tuple(leaf.shape)
        for p, leaf in jax.tree_util.tree_flatten_with_path(base_params)[0]
    }

    modules: dict[str, dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if not k.startswith(prefix + "_"):
            continue
        mod, leaf = k.rsplit(".", 1) if k.endswith(".alpha") else (
            k.rsplit(".", 2)[0], ".".join(k.rsplit(".", 2)[1:]))
        modules.setdefault(mod, {})[leaf] = np.asarray(v)

    specs: dict[str, dict] = {}
    params: dict[str, dict] = {}
    staged: dict[str, dict[int, tuple]] = {}
    for mod, leaves in sorted(modules.items()):
        hit = table.get(mod)
        if hit is None:
            if strict:
                raise KeyError(f"LoRA module {mod!r} matches no base layer")
            continue
        name, layer = hit
        down = np.asarray(leaves["lora_down.weight"], np.float32)
        up = np.asarray(leaves["lora_up.weight"], np.float32)
        rank = down.shape[0]
        alpha = float(leaves.get("alpha", np.float32(rank)))
        shape = shapes[name]
        kernel_shape = shape[1:] if layer is not None else shape
        if down.ndim == 4:  # LoCon conv: [r, cin, kh, kw] -> flattened
            kh, kw = down.shape[2], down.shape[3]
            down = down.transpose(2, 3, 1, 0).reshape(-1, rank)
            up = up.reshape(up.shape[0], rank).T
        else:
            down, up = down.T, up.T
        # C-contiguous so the merge matmul hits the same XLA kernel
        # (and accumulation order) as a natively-created adapter
        down = np.ascontiguousarray(down)
        up = np.ascontiguousarray(up)
        spec = {
            "algo": "lora", "alpha": alpha, "dim": rank, "factor": -1,
            "shape": shape,
            "stack": (shape[0],) if layer is not None else (),
        }
        if layer is not None:
            # same fit check as the non-stacked branch — a mismatched
            # file would otherwise fail deep in np.stack/merge with an
            # opaque shape error
            if down.shape[0] != int(np.prod(kernel_shape[:-1])) or \
                    up.shape[1] != kernel_shape[-1]:
                raise ValueError(
                    f"{mod}: LoRA shapes {down.shape}/{up.shape} do not "
                    f"fit stacked base kernel {kernel_shape} "
                    f"(layer {layer} of {shape[0]})"
                )
            prev = specs.get(name)
            if prev is not None and (prev["alpha"], prev["dim"]) != (
                    alpha, rank):
                raise ValueError(
                    f"{name}: per-layer rank/alpha differ inside one "
                    f"scanned stack ({prev['dim']}/{prev['alpha']} vs "
                    f"{rank}/{alpha}) — unsupported for stacked adapters"
                )
            specs[name] = spec
            staged.setdefault(name, {})[layer] = (down, up)
        else:
            if down.shape[0] != int(np.prod(kernel_shape[:-1])) or \
                    up.shape[1] != kernel_shape[-1]:
                raise ValueError(
                    f"{mod}: LoRA shapes {down.shape}/{up.shape} do not "
                    f"fit base kernel {kernel_shape}"
                )
            specs[name] = spec
            params[name] = {"lora_down": down, "lora_up": up}

    for name, per_layer in staged.items():
        n_layers = specs[name]["shape"][0]
        missing = [i for i in range(n_layers) if i not in per_layer]
        if missing:
            raise ValueError(
                f"{name}: scanned stack missing LoRA layers {missing}"
            )
        params[name] = {
            "lora_down": np.stack(
                [per_layer[i][0] for i in range(n_layers)]),
            "lora_up": np.stack([per_layer[i][1] for i in range(n_layers)]),
        }
    return LycorisAdapter(specs, params, multiplier=multiplier)


def load_kohya_lora(path: str, base_params: Any, **kw) -> LycorisAdapter:
    """Read a kohya ``.safetensors``/``.pt`` LoRA file into an adapter."""
    from uwudiff_tpu.models.import_torch import load_torch_state_dict

    return import_kohya_lora(load_torch_state_dict(path), base_params, **kw)
