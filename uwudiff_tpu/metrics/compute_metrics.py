"""Config-driven metric harness (parity with
``duwu/metrics/compute_metrics.py``)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

__all__ = ["MetricConfig", "compute_metrics"]


@dataclasses.dataclass
class MetricConfig:
    name: str
    metric_func: Callable  # partial taking generated inputs
    needs_prompts: bool = False
    needs_real: bool = False  # FID-style: (real, generated) pair
    kwargs: dict = dataclasses.field(default_factory=dict)


def compute_metrics(
    metric_configs: list[MetricConfig],
    generated_images,
    prompts=None,
    real_images=None,
) -> dict[str, Any]:
    """Run every configured metric over the generated set
    (``compute_metrics.py:15-29``)."""
    results: dict[str, Any] = {}
    for cfg in metric_configs:
        if cfg.needs_real:
            ref = real_images if real_images is not None else generated_images
            results[cfg.name] = cfg.metric_func(
                ref, generated_images, **cfg.kwargs
            )
        elif cfg.needs_prompts:
            if prompts is None:
                # config supplied no prompts (e.g. FID-only runs of
                # demo_metrics_inception.yaml): skip rather than crash
                results[cfg.name] = None
                continue
            results[cfg.name] = cfg.metric_func(
                generated_images, prompts, **cfg.kwargs
            )
        else:
            results[cfg.name] = cfg.metric_func(generated_images, **cfg.kwargs)
    return results
