#!/usr/bin/env python
"""End-to-end evaluation: sample a prompt set, then score it.

One command covering the reference's two-stage eval flow
(``test_scripts/test_sampling.py`` -> ``test_metrics.py``): generate N
images per prompt through the jitted sampler, write PNGs (or latents),
and run the configured metrics (FID vs a real set, CLIP-score vs the
prompts) over the fresh samples.

    python scripts/evaluate.py \
        --sampling-configs configs/sampling/demo_sampling.yaml \
        --metrics-configs configs/demo_metrics_inception.yaml \
        --prompts-file prompts.txt --out-dir eval_out/
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sampling-configs", nargs="+", required=True)
    parser.add_argument("--metrics-configs", nargs="+", required=True)
    parser.add_argument(
        "--prompts-file", default=None,
        help="one prompt per line; default: the sampling config's prompt",
    )
    parser.add_argument("--out-dir", default="eval_out")
    parser.add_argument("--batch-size", type=int, default=4)
    args = parser.parse_args()

    from uwudiff_tpu.config import load_config_files

    out = Path(args.out_dir)
    img_dir = out / "samples"
    img_dir.mkdir(parents=True, exist_ok=True)

    prompts = None
    if args.prompts_file:
        prompts = [
            l.strip()
            for l in Path(args.prompts_file).read_text().splitlines()
            if l.strip()
        ]

    # --- stage 1: generate (reuse the sampling CLI in-process) ---------
    sample_cfg = load_config_files(args.sampling_configs)
    if prompts is None:
        prompts = [sample_cfg["sampling_func"]["prompt"]]

    # batch the prompt list through the sampler via config overlay
    import yaml

    base_neg = sample_cfg["sampling_func"].get("neg_prompt", "")
    all_prompts = []
    for lo in range(0, len(prompts), args.batch_size):
        chunk = prompts[lo : lo + args.batch_size]
        overlay = {
            "sampling_func": {
                "prompt": chunk if len(chunk) > 1 else chunk[0],
                "neg_prompt": (
                    [base_neg] * len(chunk) if len(chunk) > 1 else base_neg
                ),
                "num_samples": len(chunk),
            }
        }
        ov_path = out / f"_overlay_{lo}.yaml"
        ov_path.write_text(yaml.safe_dump(overlay))
        chunk_dir = img_dir / f"batch_{lo:05d}"
        rc = subprocess.run(
            [
                sys.executable,
                str(Path(__file__).parent / "sample.py"),
                "--configs",
                *args.sampling_configs,
                str(ov_path),
                "--out-dir",
                str(chunk_dir),
            ],
        ).returncode
        if rc != 0:
            sys.exit(rc)
        all_prompts.extend(chunk)

    # --- stage 2: score ------------------------------------------------
    prompts_path = out / "prompts.yaml"
    prompts_path.write_text(yaml.safe_dump({"prompts": all_prompts}))
    rc = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).parent / "metrics.py"),
            "--configs",
            *args.metrics_configs,
            str(prompts_path),
            "--generated-image-dir",
            str(img_dir),
        ],
        capture_output=True,
        text=True,
    )
    sys.stderr.write(rc.stderr)
    if rc.returncode != 0:
        sys.exit(rc.returncode)
    results = json.loads(rc.stdout.strip().splitlines()[-1])
    (out / "results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
