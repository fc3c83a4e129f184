import json

import numpy as np

from uwudiff_tpu.data import TrainDataModule
from uwudiff_tpu.diffusion import NNWeightedRFLoss, NoiseSchedule
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training.callbacks import (
    LogAdditionalLosses,
    PlotValLossPerTimestep,
)
from uwudiff_tpu.training.nn_weighted import NNWeightedLossTrainer


def test_callbacks_through_fit(tmp_path):
    """NN-weighted training with both callbacks: extra EMA loss streams
    land in the jsonl log and the per-timestep val plot is produced."""
    trainer = NNWeightedLossTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=NNWeightedRFLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    dm = TrainDataModule(
        dataset_config={
            "_target_": "uwudiff_tpu.data.DummyDataset",
            "sample_size": [16, 16, 4],
            "n_samples": 8,
        },
        dataloader_config={"batch_size": 4, "seed": 0},
        val_dataset_config={
            "_target_": "uwudiff_tpu.data.DummyDataset",
            "sample_size": [16, 16, 4],
            "n_samples": 4,
            "seed": 7,
        },
    )
    plot_cb = PlotValLossPerTimestep(n_bins=10)
    log_cb = LogAdditionalLosses(
        ["rescaled_losses", "pred_losses", "loss_pred_losses"]
    )
    trainer.fit(
        dm,
        max_steps=4,
        val_every=2,
        log_dir=str(tmp_path),
        log_every=100,
        callbacks=[log_cb, plot_cb],
    )
    records = [
        json.loads(line) for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    keys = set().union(*(r.keys() for r in records))
    assert "train/ema_rescaled_losses" in keys
    assert "train/loss_pred_losses" in keys
    assert "val/loss" in keys
    # the per-timestep plot got logged as an image (npy fallback or png)
    images_dir = tmp_path / "images"
    assert images_dir.exists() and any(images_dir.iterdir())
    # callback state round-trips
    state = log_cb.state_dict()
    cb2 = LogAdditionalLosses(["rescaled_losses"])
    cb2.load_state_dict(state)
    assert cb2.ema_values == log_cb.ema_values


def test_plot_callback_bins():
    cb = PlotValLossPerTimestep(n_bins=4, n_timesteps=1000)

    class Aux:
        timesteps = np.asarray([100.0, 100.0, 900.0])
        losses = np.asarray([1.0, 3.0, 5.0])

    cb.on_validation_start(None)
    cb.on_validation_batch_end(None, Aux())
    centers, means, stds = cb.compute()
    assert len(centers) == 4
    np.testing.assert_allclose(means[0], 2.0)
    np.testing.assert_allclose(means[3], 5.0)
    assert np.isnan(means[1]) and np.isnan(means[2])


def test_sample_images_callback_text(tmp_path):
    """SampleImages samples the fixed prompts mid-fit and at fit end,
    logging uint8 images through the logger; the underlying pipeline
    compiles once (zero-retrace across triggers)."""
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.vae import AutoencoderKL
    from uwudiff_tpu.training import DMTrainer
    from uwudiff_tpu.training.callbacks import SampleImages

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": te,
            "vae": AutoencoderKL.from_config("tiny"),
        },
        lr=1e-4,
        use_warm_up=False,
        seed=0,
    )
    dm = TrainDataModule(
        dataset_config={
            "_target_": "uwudiff_tpu.data.DummyDataset",
            "sample_size": [32, 32, 3],
            "n_samples": 4,
        },
        dataloader_config={"batch_size": 2, "seed": 0},
    )
    cb = SampleImages(
        prompts=["a cat", "a dog"], every_steps=2, num_steps=2,
        cfg_scale=3.0, width=32, height=32,
    )
    trainer.fit(dm, max_steps=3, log_dir=str(tmp_path), callbacks=[cb])
    import os

    imgs = sorted(os.listdir(tmp_path / "images"))
    # trigger at step 2 + fit-end at step 3: 2 prompts x 2 triggers
    assert len(imgs) == 4, imgs
    arr = np.load(tmp_path / "images" / imgs[0])
    assert arr.dtype == np.uint8 and arr.shape == (32, 32, 3)
    assert cb._pipeline.trace_count == 1  # both triggers, one trace


def test_sample_images_callback_class(tmp_path):
    """Class-conditional (DiT) variant logs one image per label."""
    from uwudiff_tpu.models.dit import DiT
    from uwudiff_tpu.models.vae import AutoencoderKL
    from uwudiff_tpu.training import DMTrainer
    from uwudiff_tpu.training.callbacks import SampleImages
    from uwudiff_tpu.diffusion import RectifiedFlowLoss, NoiseSchedule

    trainer = DMTrainer(
        model_config={
            "unet": DiT.from_config("tiny"),
            "te": None,
            "vae": AutoencoderKL.from_config("tiny"),
        },
        lr=1e-4,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    dm = TrainDataModule(
        dataset_config={
            "_target_": "uwudiff_tpu.data.DummyDataset",
            "sample_size": [32, 32, 3],
            "n_samples": 4,
            "n_classes": trainer.unet.num_classes,
        },
        dataloader_config={"batch_size": 2, "seed": 0},
    )
    cb = SampleImages(
        class_labels=[0, 1], every_steps=0, num_steps=2,
        cfg_scale=2.0, width=32, height=32,
    )
    trainer.fit(dm, max_steps=2, log_dir=str(tmp_path), callbacks=[cb])
    import os

    imgs = sorted(os.listdir(tmp_path / "images"))
    assert len(imgs) == 2, imgs  # fit-end only (every_steps=0)
