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

    metric_configs = [
        MetricConfig(**instantiate_any(m)) if not isinstance(m, MetricConfig) else m
        for m in config["metrics"]
    ]
    results = compute_metrics(metric_configs, images, prompts)
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
