"""Named feature extractors for the metric harness (so configs can
reference them by dotted path — the zero-egress stand-ins for
torchmetrics' bundled Inception).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["flatten_features", "downsample_features", "clip_vision_features"]


def flatten_features(images: jnp.ndarray) -> jnp.ndarray:
    """Identity features: [N, ...] -> [N, prod]. For smoke tests and
    pixel-statistics FID."""
    return images.reshape(images.shape[0], -1)


def downsample_features(images: jnp.ndarray, size: int = 8) -> jnp.ndarray:
    """Cheap perceptual-ish features: average-pool to size x size."""
    import jax

    n, h, w, c = images.shape
    pooled = jax.image.resize(images, (n, size, size, c), method="linear")
    return pooled.reshape(n, -1)


def clip_vision_features(preset: str = "tiny", params_path: str | None = None):
    """Returns a feature_fn backed by the CLIP vision tower; pass an
    .npz params export (or random init for smoke tests)."""
    import jax

    from uwudiff_tpu.models.clip import CLIPVisionModel

    model = CLIPVisionModel.from_config(preset)

    def build_params(sample_shape):
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, jnp.zeros(sample_shape))["params"]
        if params_path:
            from uwudiff_tpu.training.checkpoint import load_params_npz

            params = load_params_npz(params_path, params)
        return params

    state = {}

    def feature_fn(images):
        if "params" not in state:
            state["params"] = build_params((1, *images.shape[1:]))
        return model.apply({"params": state["params"]}, images)

    return feature_fn
