"""Model loading config (parity with ``duwu/loader.py``).

A model config node may carry ``_load_config_`` with:

- ``ckpt_path``: local checkpoint (.safetensors/.pt/.bin torch file, .npz
  export, or an Orbax directory)
- ``state_dict_key`` / ``state_dict_prefix``: sub-dict extraction
  (``duwu/loader.py:24-33``)
- ``importer``: "unet" | "vae" | "clip" | "dit" | "npz" (torch-name
  translation; auto-detected from the module class when omitted)
- ``param_dtype``: cast restored params (e.g. "bfloat16")
- ``to_freeze``: exclude from training (the trainer freezes te/vae by
  construction; this marks the unet frozen for adapter-only runs)

The reference's ``precision``/``device``/``to_compile`` knobs map to the
model's compute ``dtype`` field, GSPMD device placement, and default-on
jit respectively — they are properties of the jitted program here, not
of the loader.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp

from uwudiff_tpu.config import instantiate_any

__all__ = ["ModelLoadConfig", "load_any", "apply_load_config"]


@dataclasses.dataclass
class ModelLoadConfig:
    ckpt_path: str | None = None
    state_dict_key: str | None = None
    state_dict_prefix: str | None = None
    importer: str | None = None
    param_dtype: str | None = None
    to_freeze: bool = False
    # single-file LDM/A1111 checkpoints bundle several text encoders;
    # te_index picks which tower this module loads (SDXL: 0 = CLIP-L,
    # 1 = OpenCLIP-bigG)
    te_index: int = 0
    # strict=False keeps initialized values for params absent from the
    # checkpoint (IP-Adapter projections inside a pretrained UNet,
    # enlarged TI vocabs, new heads) instead of raising
    strict: bool = True
    # accepted for reference-config compatibility; handled elsewhere
    precision: str | None = None
    device: str | None = None
    to_compile: bool = False


def load_any(node: Any) -> tuple[Any, ModelLoadConfig | None]:
    """Instantiate a model node, splitting off ``_load_config_``
    (``duwu/loader.py:58-67`` semantics, params applied later)."""
    load_cfg = None
    if isinstance(node, dict) and "_load_config_" in node:
        node = dict(node)
        load_cfg = ModelLoadConfig(**node.pop("_load_config_"))
    return instantiate_any(node), load_cfg


def _auto_importer(module) -> str:
    from uwudiff_tpu.models.clip import CLIPTextModel
    from uwudiff_tpu.models.unet import UNet2DConditionModel as _UNet

    if isinstance(module, _UNet) and getattr(
        module, "controlnet_mode", False
    ):
        return "controlnet"
    from uwudiff_tpu.models.dit import DiT
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.vae import AutoencoderKL

    if isinstance(module, UNet2DConditionModel):
        return "unet"
    if isinstance(module, AutoencoderKL):
        return "vae"
    if isinstance(module, CLIPTextModel):
        return "clip"
    if isinstance(module, DiT):
        return "dit"
    from uwudiff_tpu.models.mmdit import MMDiT

    if isinstance(module, MMDiT):
        return "mmdit"
    from uwudiff_tpu.models.flux import Flux

    if isinstance(module, Flux):
        return "flux"
    return "npz"


def apply_load_config(
    params: Any, cfg: ModelLoadConfig | None, module=None
) -> Any:
    """Restore + cast params per the load config (``prepare_model``
    equivalent, ``duwu/loader.py:36-55``)."""
    if cfg is None:
        return params
    if cfg.ckpt_path:
        path = cfg.ckpt_path
        if os.path.isdir(path):  # Orbax checkpoint dir
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
            )
            params = ckptr.restore(path, abstract)
        elif path.endswith(".npz") and (cfg.importer or "npz") == "npz":
            from uwudiff_tpu.training.checkpoint import load_params_npz

            params = load_params_npz(path, params, strict=cfg.strict)
        else:
            import functools

            from uwudiff_tpu.models.import_torch import (
                clip_text_key_map,
                controlnet_key_map,
                dit_key_map,
                extract_state_dict,
                flux_key_map,
                import_params,
                load_torch_state_dict,
                mmdit_key_map,
                unet_key_map,
                vae_key_map,
            )

            sd = load_torch_state_dict(path)
            sd = extract_state_dict(
                sd, cfg.state_dict_key, cfg.state_dict_prefix
            )
            importer = cfg.importer or _auto_importer(module)
            from uwudiff_tpu.models.ldm_checkpoint import (
                is_ldm_checkpoint,
                ldm_to_diffusers,
            )

            if is_ldm_checkpoint(sd):
                # single-file A1111/ComfyUI checkpoint: convert ONLY
                # the component this module needs to diffusers naming
                # (an SDXL pipeline loads unet+vae+2 TEs from the same
                # file — converting everything per component would
                # quadruple the work)
                if importer in ("unet", "controlnet"):
                    part = "unet"
                elif importer == "vae":
                    part = "vae"
                elif importer == "clip":
                    part = "text_encoders"
                else:
                    raise ValueError(
                        f"single-file LDM checkpoints carry unet/vae/clip "
                        f"components; importer {importer!r} cannot load one"
                    )
                parts = ldm_to_diffusers(sd, only=part)
                if part == "text_encoders":
                    tes = parts.get("text_encoders", [])
                    if cfg.te_index >= len(tes):
                        raise ValueError(
                            f"checkpoint has {len(tes)} text encoder(s); "
                            f"te_index={cfg.te_index} out of range"
                        )
                    sd = tes[cfg.te_index]
                else:
                    sd = parts.get(part)
                    if sd is None:
                        raise ValueError(
                            f"single-file checkpoint {path!r} carries no "
                            f"{part} component (importer {importer!r})"
                        )
            key_map = {
                "unet": unet_key_map,
                "controlnet": controlnet_key_map,
                "vae": vae_key_map,
                "clip": clip_text_key_map,
                "dit": dit_key_map,
                "flux": flux_key_map,
                # final_block (context_pre_only) resolves to torch index
                # depth-1
                "mmdit": functools.partial(
                    mmdit_key_map, depth=getattr(module, "depth", None)
                ),
            }[importer]
            params = import_params(params, sd, key_map, strict=cfg.strict)
    dtype = cfg.param_dtype or cfg.precision
    if dtype:
        dtype = dtype.replace("torch.", "")
        if dtype == "float16":  # TPU-native half is bfloat16
            dtype = "bfloat16"
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.dtype(dtype)), params
        )
    return params
