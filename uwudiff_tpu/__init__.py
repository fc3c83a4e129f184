"""uwudiff_tpu — a TPU-native diffusion model training framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of UwUDiff
(reference: /root/reference, KohakuBlueleaf/UwUDiff): config-driven
training of latent/pixel diffusion models (SD1.x / SDXL class),
composable loss objects (DDPM/EDM-sigma, rectified flow, learned loss
weighting), multi-text-encoder conditioning, RoPE UNet variants,
k-diffusion-style samplers with CFG/CFG++ and image->noise inversion,
and FID/CLIP evaluation — all re-designed TPU-first:

- models are flax.linen modules in NHWC layout, bf16 compute / fp32 params
- the train step is a single jit-compiled function, sharded over a
  ``jax.sharding.Mesh`` with ``data`` and ``fsdp`` axes (GSPMD collectives)
- samplers are ``lax.scan`` loops compiled end-to-end
- the attention hot path is a Pallas flash-attention kernel
- checkpointing is Orbax-based with sharding-aware restore
"""

__version__ = "0.1.0"

from uwudiff_tpu.config import instantiate_any, load_config_files, merge_configs

__all__ = [
    "instantiate_any",
    "load_config_files",
    "merge_configs",
    "__version__",
]
