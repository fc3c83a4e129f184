import jax
import numpy as np

from uwudiff_tpu.data import DummyDataset
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.models.vae import AutoencoderKL
from uwudiff_tpu.serving import Txt2ImgPipeline
from uwudiff_tpu.training import DMTrainer


def test_pipeline_from_trainer_end_to_end():
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
    ds = DummyDataset(sample_size=(32, 32, 3), n_samples=4)
    ds.set_tokenizers(trainer.tokenizers)
    trainer.train_step(ds.collate([ds[0], ds[1]]))

    pipe = Txt2ImgPipeline.from_trainer(trainer)
    # tiny vae downsamples 2x
    assert pipe.vae_downscale == 2
    images = pipe(
        prompt="a cat", neg_prompt="", num_steps=2, num_samples=2,
        width=32, height=32, seed=0,
    )
    assert len(images) == 2
    assert images[0].size == (32, 32)
    arr = np.asarray(images[0])
    assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8

    latents = pipe(
        prompt="a cat", num_steps=2, num_samples=1, width=32, height=32,
        return_latents=True,
    )
    assert latents.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_batching_server_groups_and_resolves():
    """Continuous-batching loop: compatible requests batch into one
    compiled call; mixed signatures split into separate groups; every
    future resolves with its own sample."""
    from uwudiff_tpu.serving import BatchingServer, Request

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
    ds = DummyDataset(sample_size=(32, 32, 4), n_samples=4)
    ds.set_tokenizers(trainer.tokenizers)
    trainer.setup(ds.collate([ds[0], ds[1]]))

    from uwudiff_tpu.serving import Txt2ImgPipeline

    pipe = Txt2ImgPipeline.from_trainer(trainer)
    server = BatchingServer(
        pipe, buckets=[(128, 128), (256, 128)], max_batch=3,
        max_wait_s=0.2,
    ).start()
    try:
        reqs = [
            Request(prompt=f"cat {i}", width=130, height=126, num_steps=2,
                    return_latents=True)
            for i in range(3)
        ] + [
            Request(prompt="wide", width=256, height=128, num_steps=2,
                    return_latents=True)
        ]
        futs = [server.submit(r) for r in reqs]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        server.stop()
    # bucket snap: 130x126 -> 128x128 latents 16x16; 256x128 -> 32x16
    for o in outs[:3]:
        assert o.shape == (16, 16, 4)
    assert outs[3].shape == (16, 32, 4)
    # different prompts in one batch produce different samples
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_batching_server_nearest_bucket():
    from uwudiff_tpu.serving import BatchingServer

    srv = BatchingServer(pipeline=None, buckets=[(1024, 1024), (1280, 768)])
    assert srv.nearest_bucket(1000, 1000) == (1024, 1024)
    assert srv.nearest_bucket(1344, 700) == (1280, 768)
