from uwudiff_tpu.metrics.fid import compute_fid, frechet_distance, gaussian_stats
from uwudiff_tpu.metrics.clip_score import compute_clip_score
from uwudiff_tpu.metrics.compute_metrics import MetricConfig, compute_metrics

__all__ = [
    "compute_fid",
    "frechet_distance",
    "gaussian_stats",
    "compute_clip_score",
    "MetricConfig",
    "compute_metrics",
]
