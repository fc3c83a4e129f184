#!/usr/bin/env python
"""Metrics CLI (parity with ``test_scripts/test_metrics.py``).

    python scripts/metrics.py --configs configs/demo_metrics.yaml \
        --generated-image-dir samples/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--generated-image-dir", required=True)
    args = parser.parse_args()

    import numpy as np

    from uwudiff_tpu.config import instantiate_any, load_config_files
    from uwudiff_tpu.data.utils import vae_image_preprocess
    from uwudiff_tpu.metrics import MetricConfig, compute_metrics
    from uwudiff_tpu.utils import get_images_recursively

    config = load_config_files(args.configs)
    paths = sorted(get_images_recursively(args.generated_image_dir))
    from PIL import Image

    images = [vae_image_preprocess(Image.open(p)) for p in paths]
    prompts = config.get("prompts")
    real_images = None
    if config.get("real_image_dir"):
        real_paths = sorted(get_images_recursively(config["real_image_dir"]))
        real_images = [vae_image_preprocess(Image.open(p)) for p in real_paths]

    metric_configs = []
    for m in config["metrics"]:
        if isinstance(m, MetricConfig):
            metric_configs.append(m)
            continue
        m = dict(m)
        m["metric_func"] = instantiate_any(m["metric_func"])
        metric_configs.append(MetricConfig(**m))
    results = compute_metrics(
        metric_configs, images, prompts, real_images=real_images
    )
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
