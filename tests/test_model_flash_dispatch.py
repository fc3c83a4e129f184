"""Model-level flash-dispatch wiring: a Transformer2DModel forward with
the Pallas kernel forced (interpret mode on CPU) must match the XLA
path — covering the dispatch decisions the unit tests can't see from
inside `ops/`: self-attention (Sq=Sk=256), short-KV cross-attention
under UWU_FLASH_XATTN=1, and the mask→key-bias plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.models.transformer import Transformer2DModel
from uwudiff_tpu.ops import attention as attention_mod


def _run(force_flash: bool, mask=None):
    model = Transformer2DModel(
        num_heads=2,
        head_dim=16,
        num_layers=2,
        cross_attention_dim=24,
        use_linear_projection=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 40, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, ctx)
    prev = attention_mod._flash_override
    attention_mod._flash_override = True if force_flash else False
    try:
        out = model.apply(params, x, ctx, mask)
    finally:
        attention_mod._flash_override = prev
    return np.asarray(out)


def test_flash_path_matches_xla_through_model():
    os.environ["UWU_FLASH_XATTN"] = "1"  # admit Sk=40 cross-attention
    try:
        flash = _run(force_flash=True)
        xla = _run(force_flash=False)
    finally:
        os.environ.pop("UWU_FLASH_XATTN")
    np.testing.assert_allclose(flash, xla, atol=3e-5)


def test_flash_path_with_encoder_mask():
    mask = jnp.asarray(
        np.concatenate([np.ones((2, 25)), np.zeros((2, 15))], axis=1)
    )
    os.environ["UWU_FLASH_XATTN"] = "1"
    try:
        flash = _run(force_flash=True, mask=mask)
        xla = _run(force_flash=False, mask=mask)
    finally:
        os.environ.pop("UWU_FLASH_XATTN")
    np.testing.assert_allclose(flash, xla, atol=3e-5)
