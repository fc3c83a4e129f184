#!/usr/bin/env python
"""Training CLI (parity with ``test_scripts/test_train.py``).

    python scripts/train.py --configs configs/demo_training.yaml [more.yaml ...]

Later configs overlay earlier ones (OmegaConf-merge semantics).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--resume-from-checkpoint", default=None)
    parser.add_argument("--fast-dev-run", action="store_true")
    args = parser.parse_args()

    from uwudiff_tpu.config import instantiate_any, load_config_files
    from uwudiff_tpu.utils import setup_uwu_logger

    setup_uwu_logger()
    config = load_config_files(args.configs)

    run_cfg = dict(config.get("run_config", {}))
    seed = config.get("seed", 42)

    trainer_cfg = dict(config["trainer"])
    trainer_cfg.setdefault("seed", seed)
    trainer = instantiate_any(trainer_cfg)
    data_module = instantiate_any(config["data"])

    fast_dev_run = args.fast_dev_run or run_cfg.pop("fast_dev_run", False)
    resume = args.resume_from_checkpoint or run_cfg.pop("resume_from", None)
    trainer.fit(
        data_module,
        fast_dev_run=fast_dev_run,
        resume_from=resume,
        **run_cfg,
    )
    print(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
