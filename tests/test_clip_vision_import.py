"""CLIP-vision import: behavioral equivalence with HF transformers.

Builds a randomly-initialized ``CLIPVisionModelWithProjection`` (tiny
config), imports its state dict through ``clip_vision_key_map``, and
asserts our tower computes the same image embedding — a true end-to-end
check of the CLIP-score backbone import path
(reference: ``duwu/metrics/clip.py:8-33``, DFN5B-CLIP tower).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from uwudiff_tpu.models.clip import CLIPVisionModel
from uwudiff_tpu.models.import_torch import clip_vision_key_map, import_params


def test_clip_vision_matches_hf_transformers():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(cfg).eval()

    ours = CLIPVisionModel.from_config("tiny")
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(
        np.float32
    )
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = import_params(params, sd, clip_vision_key_map, strict=True)

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = hf(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_clip_vision_features_loads_torch_checkpoint(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from uwudiff_tpu.metrics.features import clip_vision_features

    cfg = CLIPVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf = CLIPVisionModelWithProjection(cfg).eval()
    ckpt = tmp_path / "clip_vision.pt"
    torch.save(hf.state_dict(), str(ckpt))

    fn = clip_vision_features(preset="tiny", params_path=str(ckpt))
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32
    )
    got = np.asarray(fn(jnp.asarray(x)))
    with torch.no_grad():
        ref = hf(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)
