import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.metrics import (
    compute_clip_score,
    compute_fid,
    frechet_distance,
    gaussian_stats,
)
from uwudiff_tpu.metrics.clip_score import clip_score_from_embeddings


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 8))
    mu, sig = gaussian_stats(feats)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8


def test_frechet_diagonal_closed_form():
    """For diagonal Gaussians FID = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1 = np.zeros(3)
    mu2 = np.asarray([1.0, 0.0, 0.0])
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([1.0, 1.0, 1.0])
    want = 1.0 + (2 - 1) ** 2 + (3 - 1) ** 2
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_compute_fid_orders_distributions():
    rng = np.random.default_rng(0)
    real = [rng.standard_normal((4, 4, 2)).astype(np.float32) for _ in range(64)]
    close = [rng.standard_normal((4, 4, 2)).astype(np.float32) for _ in range(64)]
    far = [
        (rng.standard_normal((4, 4, 2)) + 3.0).astype(np.float32)
        for _ in range(64)
    ]

    def feature_fn(x):
        return x.reshape(x.shape[0], -1)

    fid_close = compute_fid(real, close, feature_fn, batch_size=16)
    fid_far = compute_fid(real, far, feature_fn, batch_size=16)
    assert fid_close < fid_far
    assert fid_far > 9.0  # |dmu|^2 ~ 32 * 9


def test_clip_score_formula():
    img = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    txt = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    scores = clip_score_from_embeddings(img, txt)
    np.testing.assert_allclose(np.asarray(scores), [100.0, 0.0], atol=1e-5)


def test_compute_clip_score_with_tiny_towers():
    from uwudiff_tpu.models.clip import CLIPTextModel, CLIPVisionModel
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    vision = CLIPVisionModel.from_config("tiny")
    text = CLIPTextModel.from_config("tiny", projection_dim=16)
    tok = SimpleTokenizer(model_max_length=8)
    rng = jax.random.PRNGKey(0)
    v_params = vision.init(rng, jnp.zeros((1, 32, 32, 3)))["params"]
    batch = tok(["x"])
    t_params = text.init(
        rng, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
    )["params"]

    def image_embed_fn(images):
        return vision.apply({"params": v_params}, images)

    def text_embed_fn(texts):
        b = tok(list(texts))
        out = text.apply(
            {"params": t_params},
            jnp.asarray(b["input_ids"]),
            jnp.asarray(b["attention_mask"]),
        )
        return out.text_embeds

    rng_np = np.random.default_rng(0)
    images = [rng_np.random((32, 32, 3)).astype(np.float32) for _ in range(4)]
    prompts = ["a", "b", "c", "d"]
    score = compute_clip_score(
        images, prompts, image_embed_fn, text_embed_fn, batch_size=2
    )
    assert 0.0 <= score <= 100.0


def test_metric_harness():
    from uwudiff_tpu.metrics import MetricConfig, compute_metrics

    configs = [
        MetricConfig(name="count", metric_func=lambda imgs: len(imgs)),
        MetricConfig(
            name="with_prompts",
            metric_func=lambda imgs, prompts: len(prompts),
            needs_prompts=True,
        ),
    ]
    out = compute_metrics(configs, [1, 2, 3], prompts=["a", "b", "c"])
    assert out == {"count": 3, "with_prompts": 3}
    # prompt-needing metrics skip (None) when no prompts are supplied,
    # e.g. FID-only runs of demo_metrics_inception.yaml
    out = compute_metrics(configs, [1, 2, 3])
    assert out == {"count": 3, "with_prompts": None}


def test_fid_self_zero_and_noise_monotonic_inception():
    """VERDICT r1 #3: with a deterministic-weight Inception tower, FID of
    a set against itself is ~0 and grows monotonically with noise."""
    import jax.numpy as jnp

    from uwudiff_tpu.metrics import compute_fid
    from uwudiff_tpu.metrics.features import inception_features

    rng = np.random.default_rng(0)
    # structured images (not iid noise) so covariances are non-trivial
    base = rng.uniform(-1, 1, (12, 1, 1, 3)) * np.ones((12, 32, 32, 3))
    grad = np.linspace(-0.5, 0.5, 32)[None, :, None, None]
    images = np.clip(base * 0.5 + grad, -1, 1).astype(np.float32)

    fn = inception_features()  # deterministic random init
    fid_self = compute_fid(images, images.copy(), fn, batch_size=6)
    assert abs(fid_self) < 1e-3, fid_self

    fids = [fid_self]
    for sigma in (0.1, 0.3):
        noisy = np.clip(
            images + rng.normal(0, sigma, images.shape), -1, 1
        ).astype(np.float32)
        fids.append(compute_fid(images, noisy, fn, batch_size=6))
    assert fids[0] < fids[1] < fids[2], fids
