"""Loss-prediction network for NN-weighted RF loss.

The reference's ``loss_pred_module`` (``duwu/loss/rectified_flow.py:
180-183``) is a config-injected module taking ``(noisy_latent, sigmas,
**unet_kwargs)`` and returning a per-sample log-loss prediction. This is
a small TPU-friendly default: log-sigma Fourier features + pooled conv
features -> MLP -> scalar.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.layers import get_timestep_embedding

__all__ = ["SigmaLossPredictor"]


class SigmaLossPredictor(nn.Module):
    hidden_dim: int = 128
    use_latent_features: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, noisy_latent: jnp.ndarray, sigmas: jnp.ndarray, **_: Any
    ) -> jnp.ndarray:
        # sigma features on a log scale (sigmas span ~1e-3..1e3)
        log_sigma = jnp.log(jnp.maximum(sigmas.reshape(-1), 1e-8))
        feats = get_timestep_embedding(log_sigma * 100.0, self.hidden_dim)
        feats = feats.astype(self.dtype)
        if self.use_latent_features:
            x = noisy_latent.astype(self.dtype)
            pooled = jnp.concatenate(
                [x.mean(axis=(1, 2)), x.std(axis=(1, 2))], axis=-1
            )
            lat = nn.Dense(self.hidden_dim, dtype=self.dtype, name="latent_proj")(
                pooled
            )
            feats = feats + lat
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(feats)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h)
        h = nn.silu(h)
        out = nn.Dense(1, dtype=self.dtype, name="out")(h)
        return out.reshape(-1).astype(jnp.float32)
