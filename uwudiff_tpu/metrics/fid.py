"""FID evaluation (parity with ``duwu/metrics/fid.py``).

Feature extraction runs jit-compiled on TPU in batches; the Gaussian
statistics and the Frechet distance are exact float64 host math (the
trace-sqrt term computed from eigenvalues of sigma1 @ sigma2, which is
similar to a PSD matrix — no scipy.sqrtm iteration needed).

The feature extractor is pluggable: torchmetrics pins InceptionV3; in a
zero-download environment any (images -> [N, D]) callable works — e.g.
the CLIP vision tower with imported weights, or InceptionV3 weights
converted via ``models/import_torch.py``. The eval *protocol* (299x299
resize + center-crop vs COCO val2014, ``configs/demo_metrics_coco.yaml``)
is preserved in the configs.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_stats", "frechet_distance", "compute_fid", "batched_features"]


def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    feats = np.asarray(features, np.float64)
    if feats.shape[0] < 2:
        raise ValueError(
            f"FID needs >= 2 samples per set to estimate a covariance, "
            f"got {feats.shape[0]}"
        )
    mu = feats.mean(axis=0)
    sigma = np.atleast_2d(np.cov(feats, rowvar=False))
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID = |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    # eigenvalues of S1 @ S2 equal those of the PSD matrix
    # S2^(1/2) S1 S2^(1/2); clip tiny negatives from roundoff
    eigvals = np.linalg.eigvals(sigma1 @ sigma2)
    eigvals = np.clip(np.real(eigvals), 0.0, None)
    tr_sqrt = np.sum(np.sqrt(eigvals))
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt
    )


def batched_features(
    images: Iterable[np.ndarray],
    feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batch_size: int = 32,
) -> np.ndarray:
    """Run a jitted feature_fn over image batches (padding the tail so a
    single compiled shape serves the whole set)."""
    feature_fn = jax.jit(feature_fn)
    images = list(images)
    feats = []
    for i in range(0, len(images), batch_size):
        chunk = images[i : i + batch_size]
        n = len(chunk)
        batch = np.stack(chunk).astype(np.float32)
        if n < batch_size:
            batch = np.pad(batch, [(0, batch_size - n)] + [(0, 0)] * (batch.ndim - 1))
        out = np.asarray(feature_fn(jnp.asarray(batch)))[:n]
        feats.append(out)
    return np.concatenate(feats, axis=0)


def compute_fid(
    real_images: Iterable[np.ndarray],
    generated_images: Iterable[np.ndarray],
    feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batch_size: int = 32,
) -> float:
    """Batched update(real/fake) -> compute, like
    ``metrics/fid.py:17-41``."""
    real_feats = batched_features(real_images, feature_fn, batch_size)
    gen_feats = batched_features(generated_images, feature_fn, batch_size)
    mu_r, sig_r = gaussian_stats(real_feats)
    mu_g, sig_g = gaussian_stats(gen_feats)
    return frechet_distance(mu_r, sig_r, mu_g, sig_g)
