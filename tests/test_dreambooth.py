"""DreamBooth prior preservation: weighted-mean loss semantics, paired
instance/prior collate, end-to-end doubled-batch training."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data import DummyDataset, PriorPreservationDataset
from uwudiff_tpu.data.base import DataLoader
from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training import DMTrainer


def _paired_dataset(bs_instance=3, n_prior=7, w=0.4):
    ds = PriorPreservationDataset(
        instance=DummyDataset(
            sample_size=(16, 16, 4),
            n_samples=bs_instance,
            caption="a photo of sks dog",
        ),
        prior=DummyDataset(
            sample_size=(16, 16, 4),
            n_samples=n_prior,
            caption="a photo of a dog",
            seed=7,
        ),
        prior_weight=w,
    )
    return ds


def test_collate_doubles_batch_with_weights():
    ds = _paired_dataset(w=0.25)
    batch = ds.collate([ds[i] for i in range(3)])
    assert batch["sample"].shape[0] == 6
    np.testing.assert_allclose(
        batch["loss_weight"], [1, 1, 1, 0.25, 0.25, 0.25]
    )
    # instance rows first, prior rows second — captions prove ordering
    assert batch["captions"][:3] == ["a photo of sks dog"] * 3
    assert batch["captions"][3:] == ["a photo of a dog"] * 3
    # instance row data is the instance dataset's data
    np.testing.assert_array_equal(batch["sample"][0], ds.instance[0]["sample"])


def test_prior_pairing_covers_prior_set_deterministically():
    ds = _paired_dataset(bs_instance=3, n_prior=7)
    a = [ds[i]["prior"]["sample"] for i in range(3)]
    b = [ds[i]["prior"]["sample"] for i in range(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # deterministic pairing


def test_weighted_mean_loss_semantics():
    loss = DiffusionLoss(schedule=NoiseSchedule.sdxl())
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))

    def model_fn(noisy, t):
        return 0.1 * noisy

    base, aux = loss(rng, x, model_fn)
    w = jnp.asarray([1.0, 1.0, 0.5, 0.0])
    weighted, aux_w = loss(rng, x, model_fn, sample_weight=w)
    # identical rng -> identical per-sample losses; reduction differs
    np.testing.assert_allclose(
        np.asarray(aux.losses), np.asarray(aux_w.losses), rtol=1e-6
    )
    expect = float((aux.losses * w).mean())
    np.testing.assert_allclose(float(weighted), expect, rtol=1e-6)
    np.testing.assert_allclose(
        float(base), float(aux.losses.mean()), rtol=1e-6
    )


def test_dreambooth_end_to_end_train_step():
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
        lr=1e-3,
        use_warm_up=False,
        seed=0,
    )
    ds = _paired_dataset(w=0.5)
    ds.set_tokenizers(trainer.tokenizers)
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    assert batch["sample"].shape[0] == 4  # doubled
    metrics, aux = trainer.train_step(batch)
    assert np.isfinite(metrics["train/loss"])
    # zero prior weight: the prior rows contribute nothing to the loss
    batch0 = dict(batch)
    batch0["loss_weight"] = np.asarray([1, 1, 0, 0], np.float32)
    m0, aux0 = trainer.validation_step(batch0)
    mfull = trainer.validation_step(batch)[0]
    per_sample = np.asarray(aux0.losses)
    np.testing.assert_allclose(
        float(m0), per_sample[:2].sum() / 4.0, rtol=1e-5
    )
    assert float(mfull) != float(m0)


def test_loss_weight_sharded_under_data_parallel_mesh():
    """The [B] loss_weight vector must shard with the batch: meshed
    validation loss == unmeshed on the identical doubled batch."""

    def make(**kw):
        te = ConcatTextEncoders.from_config(
            [({"model_type": "clip", "preset": "tiny"},
              {"use_pooled": False, "layer_idx": -2})]
        )
        return DMTrainer(
            model_config={
                "unet": UNet2DConditionModel.from_config("tiny"),
                "te": te,
                "vae": None,
            },
            lr=1e-3,
            use_warm_up=False,
            seed=0,
            **kw,
        )

    ds = _paired_dataset(bs_instance=4, w=0.3)
    plain = make()
    meshed = make(mesh_axes={"data": 2})
    ds.set_tokenizers(plain.tokenizers)
    batch = ds.collate([ds[i] for i in range(4)])  # 8 rows on device
    rng = jax.random.PRNGKey(5)
    l_plain = plain.validation_step(batch, rng)[0]
    l_mesh = meshed.validation_step(batch, rng)[0]
    np.testing.assert_allclose(
        float(l_plain), float(l_mesh), rtol=2e-5
    )


def test_dreambooth_config_instantiates():
    from uwudiff_tpu.config import instantiate_any, load_config_file

    cfg = load_config_file("configs/demo_training_dreambooth.yaml")
    dm = instantiate_any(cfg["data"])
    dm.setup()
    ds = dm.dataset
    assert isinstance(ds, PriorPreservationDataset)
    assert len(ds) == 5


def test_collate_dispatches_to_wrapped_dataset():
    """Latent-cache-style wrapped datasets (different item schema +
    their own collate) must work through the pairing wrapper."""

    class LatentStyle(DummyDataset):
        def __getitem__(self, index):
            item = super().__getitem__(index)
            return {"latent": item["sample"],
                    "add_time_ids": item["add_time_ids"]}

        @staticmethod
        def collate(batch):
            return {
                "latent": np.stack([x["latent"] for x in batch]),
                "added_cond": {
                    "time_ids": np.stack(
                        [x["add_time_ids"] for x in batch]
                    )
                },
                "tokenizer_outputs": [],
            }

    ds = PriorPreservationDataset(
        instance=LatentStyle(sample_size=(8, 8, 4), n_samples=2),
        prior=LatentStyle(sample_size=(8, 8, 4), n_samples=3, seed=5),
        prior_weight=0.5,
    )
    batch = ds.collate([ds[0], ds[1]])
    assert batch["latent"].shape[0] == 4
    np.testing.assert_allclose(batch["loss_weight"], [1, 1, 0.5, 0.5])
