"""img2img (SDEdit) + mask inpainting tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import NoiseSchedule
from uwudiff_tpu.sampling import sample_euler_ancestral
from uwudiff_tpu.sampling.img2img import (
    image_to_image_sampling,
    img2img_sigmas,
    masked_model_wrapper,
)
from uwudiff_tpu.utils import append_dims


def test_img2img_sigmas_truncation():
    schedule = NoiseSchedule.sdxl()
    full = schedule.sample_sigmas_descending(16)
    s_full = img2img_sigmas(schedule, 16, 1.0)
    np.testing.assert_array_equal(np.asarray(s_full), np.asarray(full))

    s_half = img2img_sigmas(schedule, 16, 0.5)
    assert s_half.shape == (9,)  # 8 steps + terminal 0
    np.testing.assert_array_equal(np.asarray(s_half), np.asarray(full[8:]))
    assert float(s_half[-1]) == 0.0

    # at least one step survives tiny strengths
    s_min = img2img_sigmas(schedule, 16, 0.01)
    assert s_min.shape == (2,)

    with pytest.raises(ValueError):
        img2img_sigmas(schedule, 16, 0.0)
    with pytest.raises(ValueError):
        img2img_sigmas(schedule, 16, 1.5)


def test_masked_model_wrapper_blend():
    init = jnp.full((1, 4, 4, 1), 2.0)
    mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)

    def model(x, sigma, sigma_cond=None):
        return jnp.full_like(x, -1.0), jnp.full_like(x, -3.0)

    wrapped = masked_model_wrapper(model, init, mask)
    d, u = wrapped(jnp.zeros((1, 4, 4, 1)), jnp.ones((1,)))
    # repaint region follows the model, kept region pins to init
    np.testing.assert_allclose(np.asarray(d[:, :2]), -1.0)
    np.testing.assert_allclose(np.asarray(d[:, 2:]), 2.0)
    np.testing.assert_allclose(np.asarray(u[:, :2]), -3.0)
    np.testing.assert_allclose(np.asarray(u[:, 2:]), 2.0)


def _oracle_sampler_model(x0_target):
    """Sampler-contract model whose denoised prediction is always
    x0_target: every euler step moves the state toward it."""

    def model(x, sigma, sigma_cond=None):
        d = jnp.broadcast_to(x0_target, x.shape)
        return d, d

    return model


def test_inpaint_converges_to_blend():
    """Oracle model predicts x0_a; init latent is x0_b; with a half
    mask, deterministic euler (eta=0) must produce x0_a in the repaint
    region and exactly x0_b in the kept region."""
    schedule = NoiseSchedule.sdxl()
    x0_a = jnp.full((1, 8, 8, 4), 1.5)
    x0_b = jnp.full((1, 8, 8, 4), -0.5)
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)

    model = masked_model_wrapper(_oracle_sampler_model(x0_a), x0_b, mask)
    sigmas = schedule.sample_sigmas_descending(12)
    x = x0_b + jax.random.normal(jax.random.PRNGKey(0), x0_b.shape) * sigmas[0]
    out = sample_euler_ancestral(model, x, sigmas, rng=jax.random.PRNGKey(1), eta=0.0)
    np.testing.assert_allclose(np.asarray(out[:, :4]), 1.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), -0.5, atol=1e-3)


def _tiny_stack():
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.models.text_encoders import TextEncodingPipeline

    unet = UNet2DConditionModel.from_config("tiny")
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    rng = jax.random.PRNGKey(0)
    tok = SimpleTokenizer()
    tok_out = [{k: jnp.asarray(v) for k, v in tok(["x"]).items()}]
    te_params = te.init(rng, tok_out)["params"]
    emb, _, _, mask = te.apply({"params": te_params}, tok_out)
    unet_params = unet.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), emb, mask, None
    )["params"]
    te_pipe = TextEncodingPipeline(te, te_params, [tok])

    def unet_fn(params, x, t, ctx, m, added):
        return unet.apply({"params": params}, x, t, ctx, m, added)

    return unet_fn, unet_params, te_pipe


def test_image_to_image_end_to_end_strength_semantics():
    """Real tiny UNet: lower strength keeps the output closer to the
    init latent than higher strength (SDEdit contract)."""
    unet_fn, unet_params, te_pipe = _tiny_stack()
    schedule = NoiseSchedule.sdxl()
    init_latent = (
        jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4)) * 0.3
    )

    def run(strength):
        return image_to_image_sampling(
            unet_fn,
            te_pipe,
            init_image=None,
            prompt=["a", "b"],
            neg_prompt="",
            train_schedule=schedule,
            init_latent=init_latent,
            strength=strength,
            num_steps=8,
            cfg_scale=2.0,
            seed=3,
            return_latents=True,
            unet_params=unet_params,
        )

    out_lo = run(0.2)
    out_hi = run(0.9)
    assert out_lo.shape == init_latent.shape
    assert np.isfinite(np.asarray(out_lo)).all()
    d_lo = float(jnp.mean((out_lo - init_latent) ** 2))
    d_hi = float(jnp.mean((out_hi - init_latent) ** 2))
    assert d_lo < d_hi, (d_lo, d_hi)


def test_image_to_image_inpaint_pins_kept_region():
    unet_fn, unet_params, te_pipe = _tiny_stack()
    schedule = NoiseSchedule.sdxl()
    init_latent = (
        jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 4)) * 0.3
    )
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :, :4].set(1.0)

    out = image_to_image_sampling(
        unet_fn,
        te_pipe,
        init_image=None,
        prompt="a",
        neg_prompt="",
        train_schedule=schedule,
        init_latent=init_latent,
        strength=1.0,
        num_steps=6,
        inpaint_mask=mask,
        cfg_scale=1.5,
        seed=4,
        return_latents=True,
        unet_params=unet_params,
    )
    # kept half exactly equals the init latent; repainted half differs
    np.testing.assert_allclose(
        np.asarray(out[:, :, 4:]), np.asarray(init_latent[:, :, 4:]), atol=1e-6
    )
    assert (
        float(jnp.mean((out[:, :, :4] - init_latent[:, :, :4]) ** 2)) > 1e-4
    )


def test_image_to_image_with_vae_roundtrip():
    """Full path: pixel image -> VAE encode -> img2img -> VAE decode."""
    from uwudiff_tpu.models.vae import AutoencoderKL

    unet_fn, unet_params, te_pipe = _tiny_stack()
    schedule = NoiseSchedule.sdxl()
    vae = AutoencoderKL.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    img = jnp.clip(jax.random.normal(rng, (1, 16, 16, 3)) * 0.3, -1, 1)
    vae_params = vae.init(rng, img, rng)["params"]
    vae_std = 1.0 / vae.scaling_factor

    def vae_encode(images, rng_):
        dist = vae.apply({"params": vae_params}, images, method=vae.encode)
        return dist.sample(rng_)

    def vae_decode(latents):
        return vae.apply({"params": vae_params}, latents, method=vae.decode)

    images = image_to_image_sampling(
        unet_fn,
        te_pipe,
        init_image=img,
        prompt="a",
        neg_prompt="",
        vae_encode=vae_encode,
        vae_decode=vae_decode,
        train_schedule=schedule,
        strength=0.5,
        num_steps=4,
        cfg_scale=1.5,
        seed=5,
        vae_std=vae_std,
        unet_params=unet_params,
    )
    assert len(images) == 1
    arr = np.asarray(images[0])
    assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8
