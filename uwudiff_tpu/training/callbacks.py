"""Trainer callbacks (parity with ``duwu/trainer/callbacks.py``).

- ``LogAdditionalLosses``: EMA-smoothed wandb/jsonl streams for fields of
  the loss aux output (how NNWeightedRFLoss's four components get logged,
  ``callbacks.py:10-45``)
- ``PlotValLossPerTimestep``: per-timestep validation-loss mean/std curve
  rendered to an image (``callbacks.py:48-158``); cross-device reduction
  is unnecessary here because the jitted val step already returns global
  arrays (GSPMD gathers replace the reference's explicit ``all_gather``)
"""

from __future__ import annotations

import numpy as np

__all__ = ["LogAdditionalLosses", "PlotValLossPerTimestep"]


class LogAdditionalLosses:
    """EMA streams for aux-output fields (``callbacks.py:10-45``)."""

    def __init__(self, loss_names: list[str], ema_decay: float = 0.99):
        self.loss_names = list(loss_names)
        self.ema_decay = ema_decay
        self.ema_values: dict[str, float] = {}

    def state_dict(self) -> dict:
        return {"ema_values": dict(self.ema_values)}

    def load_state_dict(self, state: dict):
        self.ema_values = dict(state.get("ema_values", {}))

    def on_train_batch_end(self, trainer, step, metrics, aux, logger):
        scalars = {}
        for name in self.loss_names:
            value = getattr(aux, name, None)
            if value is None:
                continue
            value = float(np.mean(np.asarray(value)))
            decay = min(step / (10 + step), self.ema_decay)
            prev = self.ema_values.get(name, 0.0)
            ema = decay * prev + (1 - decay) * value
            self.ema_values[name] = ema
            scalars[f"train/{name}"] = value
            scalars[f"train/ema_{name}"] = ema
        if scalars:
            logger.log_scalars(step, scalars)


class PlotValLossPerTimestep:
    """Accumulate (timestep, loss) pairs over validation and log a
    mean±std-per-timestep-bin curve (``callbacks.py:48-158``)."""

    def __init__(self, n_bins: int = 50, n_timesteps: int = 1000):
        self.n_bins = n_bins
        self.n_timesteps = n_timesteps
        self._timesteps: list[np.ndarray] = []
        self._losses: list[np.ndarray] = []

    def on_validation_start(self, trainer):
        self._timesteps.clear()
        self._losses.clear()

    def on_validation_batch_end(self, trainer, aux):
        self._timesteps.append(np.asarray(aux.timesteps, dtype=np.float64))
        self._losses.append(np.asarray(aux.losses, dtype=np.float64))

    def compute(self):
        t = np.concatenate(self._timesteps)
        ls = np.concatenate(self._losses)
        edges = np.linspace(0, self.n_timesteps, self.n_bins + 1)
        centers = (edges[:-1] + edges[1:]) / 2
        means = np.full(self.n_bins, np.nan)
        stds = np.full(self.n_bins, np.nan)
        idx = np.clip(np.digitize(t, edges) - 1, 0, self.n_bins - 1)
        for b in range(self.n_bins):
            sel = ls[idx == b]
            if len(sel):
                means[b] = sel.mean()
                stds[b] = sel.std()
        return centers, means, stds

    def on_validation_end(self, trainer, step, logger):
        if not self._timesteps:
            return
        centers, means, stds = self.compute()
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 4))
            valid = ~np.isnan(means)
            ax.plot(centers[valid], means[valid])
            ax.fill_between(
                centers[valid],
                (means - stds)[valid],
                (means + stds)[valid],
                alpha=0.3,
            )
            ax.set_xlabel("timestep")
            ax.set_ylabel("val loss")
            fig.canvas.draw()
            img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            plt.close(fig)
            logger.log_image(step, "val/loss_per_timestep", img)
        except ImportError:
            logger.log_image(
                step,
                "val/loss_per_timestep",
                np.stack([centers, means, stds]),
            )
