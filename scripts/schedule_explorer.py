#!/usr/bin/env python
"""Schedule design tooling (parity with the reference notebooks
``test_scripts/test_diffusion_scheduler.ipynb`` and
``test_lr_scheduler.ipynb``): derive Laplace/cosine logSNR schedules,
compare sigma curves, export a schedule, and plot LR schedules.

    python scripts/schedule_explorer.py --out-dir schedule_plots
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default="schedule_plots")
    parser.add_argument("--num-train-timesteps", type=int, default=1000)
    parser.add_argument(
        "--export", default=None,
        help="export a schedule's betas to .npz (name:param, e.g. laplace:1.0)",
    )
    args = parser.parse_args()

    import numpy as np

    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.training.lr_schedules import warmup_cosine_schedule

    os.makedirs(args.out_dir, exist_ok=True)
    n = args.num_train_timesteps

    schedules = {
        "scaled_linear (SDXL)": NoiseSchedule.sdxl(),
        "laplace b=0.5": NoiseSchedule.laplace(n, b=0.5),
        "laplace b=1.0": NoiseSchedule.laplace(n, b=1.0),
        "laplace b=2.0": NoiseSchedule.laplace(n, b=2.0),
        "cosine s=1.0": NoiseSchedule.cosine_logsnr(n, s=1.0),
        "cosine s=2.0": NoiseSchedule.cosine_logsnr(n, s=2.0),
    }

    summary = {}
    for name, sched in schedules.items():
        sig = np.asarray(sched.sigmas)
        logsnr = -2 * np.log(sig)
        summary[name] = {
            "sigma_min": float(sig[0]),
            "sigma_max": float(sig[-1]),
            "logsnr": logsnr,
        }
        print(
            f"{name:24s} sigma: [{sig[0]:.4g}, {sig[-1]:.4g}]  "
            f"logSNR mid: {logsnr[len(logsnr)//2]:.3f}"
        )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.linspace(0, 1, n)
        fig, ax = plt.subplots(figsize=(7, 5))
        for name, s in summary.items():
            ax.plot(t, s["logsnr"], label=name)
        ax.set_ylim([-20, 20])
        ax.set_xlabel("t")
        ax.set_ylabel("log-SNR")
        ax.legend()
        fig.savefig(os.path.join(args.out_dir, "logsnr_schedules.png"), dpi=144)
        plt.close(fig)

        steps = np.arange(0, 20000, 50)
        fig, ax = plt.subplots(figsize=(7, 4))
        for warm in (0, 1000):
            sched = warmup_cosine_schedule(
                1e-4, warm_up_period=warm or 1, T_max=100_000, eta_min=1e-7,
                use_warm_up=warm > 0,
            )
            ax.plot(steps, [float(sched(s)) for s in steps],
                    label=f"warmup={warm}")
        ax.set_xlabel("step")
        ax.set_ylabel("lr")
        ax.legend()
        fig.savefig(os.path.join(args.out_dir, "lr_schedules.png"), dpi=144)
        plt.close(fig)
        print(f"plots written to {args.out_dir}/")
    except ImportError:
        print("matplotlib unavailable; skipping plots")

    if args.export:
        name, _, param = args.export.partition(":")
        param = float(param or 1.0)
        if name == "laplace":
            sched = NoiseSchedule.laplace(n, b=param)
        elif name == "cosine":
            sched = NoiseSchedule.cosine_logsnr(n, s=param)
        else:
            sched = NoiseSchedule.ddpm(n)
        out = os.path.join(args.out_dir, f"{name}_{param}.npz")
        np.savez(
            out,
            betas=np.asarray(sched.betas),
            alphas_cumprod=np.asarray(sched.alphas_cumprod),
        )
        print(f"exported {out}")


if __name__ == "__main__":
    main()
