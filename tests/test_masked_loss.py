"""Masked loss (community staple): per-pixel [B, H, W] masks restrict
the training loss to the masked region, normalized by mask area.
Covers the reduction math, the pixel->latent pooling, every loss class,
and the trainer end-to-end path (extends the reference's loss surface,
``duwu/loss/diffusion.py:169-193``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.data import DummyDataset
from uwudiff_tpu.diffusion import (
    DiffusionLoss,
    EDMLoss,
    NoiseSchedule,
    RectifiedFlowLoss,
)


def _loss_obj(cls=DiffusionLoss, **kw):
    return cls(schedule=NoiseSchedule.ddpm(num_train_timesteps=50), **kw)


def _model_fn(x, t, **kw):
    return 0.3 * x + 0.1


def test_reduce_per_sample_masked_math():
    loss = _loss_obj()
    rng = np.random.default_rng(0)
    losses = jnp.asarray(rng.random((2, 4, 4, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5), jnp.float32)
    got = loss._reduce_per_sample(losses, mask)
    l_np, m_np = np.asarray(losses), np.asarray(mask)[..., None]
    m_b = np.broadcast_to(m_np, l_np.shape)
    want = (l_np * m_b).reshape(2, -1).sum(1) / m_b.reshape(2, -1).sum(1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
    # channel-axis mask form [B, h, w, 1] is accepted too
    got4 = loss._reduce_per_sample(losses, mask[..., None])
    np.testing.assert_allclose(np.asarray(got4), want, rtol=1e-5)


@pytest.mark.parametrize(
    "cls", [DiffusionLoss, RectifiedFlowLoss, EDMLoss]
)
def test_ones_mask_equals_unmasked(cls):
    loss = _loss_obj(cls)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 8, 4))
    base, _ = loss(rng, x, _model_fn)
    ones, _ = loss(rng, x, _model_fn, loss_mask=jnp.ones((3, 8, 8)))
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(ones), rtol=1e-5
    )


def test_zero_region_excluded_from_loss():
    """Make the prediction WRONG only outside the mask: the masked loss
    must not see it."""
    loss = _loss_obj(target_type="epsilon", prediction_type="epsilon")
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))
    mask = jnp.zeros((2, 8, 8)).at[:, :4].set(1.0)

    def good(x_t, t, **kw):
        return jnp.zeros_like(x_t)

    def bad_outside(x_t, t, **kw):
        # same prediction inside the mask, garbage outside
        return jnp.where(mask[..., None][:, :] > 0, 0.0, 100.0)

    l_good, _ = loss(rng, x, good, loss_mask=mask)
    l_mixed, _ = loss(rng, x, bad_outside, loss_mask=mask)
    np.testing.assert_allclose(
        np.asarray(l_good), np.asarray(l_mixed), rtol=1e-5
    )
    # ...but the UNMASKED loss does see it
    l_unmasked, _ = loss(rng, x, bad_outside)
    assert float(l_unmasked) > 10 * float(l_good)


def test_pool_mask_to():
    from uwudiff_tpu.training.trainer import _pool_mask_to

    # 8x pixel mask average-pools exactly to the latent grid
    m = np.zeros((1, 16, 16), np.float32)
    m[:, :8, :] = 1.0
    pooled = _pool_mask_to(jnp.asarray(m), (2, 2))
    np.testing.assert_allclose(
        np.asarray(pooled), [[[1.0, 1.0], [0.0, 0.0]]]
    )
    # fractional coverage becomes a fractional weight
    m2 = np.zeros((1, 4, 4), np.float32)
    m2[:, 0, 0] = 1.0
    np.testing.assert_allclose(
        np.asarray(_pool_mask_to(jnp.asarray(m2), (2, 2)))[0, 0, 0], 0.25
    )
    # latent-sized passes through; [B, H, W, 1] accepted
    same = _pool_mask_to(jnp.asarray(m)[..., None], (16, 16))
    np.testing.assert_allclose(np.asarray(same), m)


def test_trainer_end_to_end_masked():
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    def build(with_mask):
        te = ConcatTextEncoders.from_config(
            [({"model_type": "clip", "preset": "tiny"},
              {"use_pooled": False, "layer_idx": -2})]
        )
        trainer = DMTrainer(
            model_config={
                "unet": UNet2DConditionModel.from_config("tiny"),
                "te": te,
                "vae": None,
            },
            lr=1e-4,
            use_warm_up=False,
            seed=0,
        )
        ds = DummyDataset(
            sample_size=(16, 16, 4), n_samples=4,
            with_loss_mask=with_mask,
        )
        ds.set_tokenizers(trainer.tokenizers)
        batch = ds.collate([ds[0], ds[1]])
        if with_mask == "ones":
            batch["loss_mask"] = np.ones_like(batch["loss_mask"])
        return trainer, batch

    trainer, batch = build(True)
    assert batch["loss_mask"].shape == (2, 16, 16)
    metrics, _ = trainer.train_step(batch)
    loss_masked = float(metrics["train/loss"])
    assert np.isfinite(loss_masked)

    # an all-ones mask reproduces the unmasked loss exactly
    t_ones, b_ones = build("ones")
    t_none, b_none = build(False)
    del b_none  # same dataset seed; drop the mask key entirely
    b_plain = dict(b_ones)
    b_plain.pop("loss_mask")
    l_ones = float(t_ones.train_step(b_ones)[0]["train/loss"])
    l_plain = float(t_none.train_step(b_plain)[0]["train/loss"])
    np.testing.assert_allclose(l_ones, l_plain, rtol=1e-5)


def test_local_dataset_mask_dir_and_alpha(tmp_path):
    from PIL import Image

    from uwudiff_tpu.data.local import LocalImageDataset

    # image + sidecar mask (white square on black)
    img = Image.fromarray(
        np.full((32, 32, 3), 128, np.uint8)
    )
    ip = tmp_path / "a.png"
    img.save(ip)
    mask = np.zeros((32, 32), np.uint8)
    mask[:16] = 255
    mdir = tmp_path / "masks"
    mdir.mkdir()
    Image.fromarray(mask).save(mdir / "a.png")

    ds = LocalImageDataset(
        [str(ip)], image_size=(16, 16), mask_dir=str(mdir),
        native_decode=False,
    )
    item = ds[0]
    m = item["loss_mask"]
    assert m.shape == (16, 16) and m.dtype == np.float32
    assert m[:7].mean() > 0.95 and m[9:].mean() < 0.05

    # alpha-channel mask
    rgba = np.dstack([np.full((32, 32, 3), 90, np.uint8), mask])
    ap = tmp_path / "b.png"
    Image.fromarray(rgba, "RGBA").save(ap)
    ds_a = LocalImageDataset(
        [str(ap)], image_size=(16, 16), alpha_mask=True,
        native_decode=False,
    )
    ma = ds_a[0]["loss_mask"]
    assert ma[:7].mean() > 0.95 and ma[9:].mean() < 0.05

    # missing mask file -> all ones; collate stacks the key
    ds_missing = LocalImageDataset(
        [str(ip)], image_size=(16, 16), mask_dir=str(tmp_path / "none"),
        native_decode=False,
    )
    np.testing.assert_allclose(ds_missing[0]["loss_mask"], 1.0)
    batch = ds.collate([ds[0], ds_missing[0]])
    assert batch["loss_mask"].shape == (2, 16, 16)
