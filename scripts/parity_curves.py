#!/usr/bin/env python
"""Loss-curve parity harness: our jittable losses vs a torch oracle of
the reference's exact math.

The oracle re-implements, in torch, the reference formulas from
``duwu/loss/diffusion.py:40-193`` (scaled-linear betas -> sigma table,
forward noising, eps/v/sample/RF target+prediction conversion, min-SNR
and debiased weights) and ``duwu/loss/rectified_flow.py:26-129``
(uniform-time sampling, log-sigma-interpolated timesteps).  Both sides
train an IDENTICAL tiny MLP denoiser (weights copied, plain SGD, fp32)
on IDENTICAL pre-drawn data/noise/timesteps for 200 steps, per
parameterization.  Output: PARITY_CURVES.md + overlay plot.

    JAX_PLATFORM_NAME=cpu python scripts/parity_curves.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init

STEPS = 200
BATCH = 8
SHAPE = (4, 4, 4)  # H, W, C
DIM = int(np.prod(SHAPE))
HIDDEN = 128
LR = 1e-2


# --------------------------------------------------------------------
# torch oracle of the reference loss math
# --------------------------------------------------------------------


class TorchOracle:
    """Reference ``DiffusionLoss``/``RectifiedFlowLoss`` math in torch.

    Behavior (not code) from ``duwu/loss/diffusion.py``:
    - betas: scaled-linear 0.00085..0.012, 1000 steps (SDXL scheduler)
    - sigma[t] = sqrt((1-acp[t])/acp[t]); x_t = (x0 + n*sigma)*scale,
      scale = 1/sqrt(sigma^2+1)                         (lines 74-82)
    - eps/v/sample/RF targets                           (lines 84-98)
    - (x0, eps) recovery per prediction type            (lines 100-125)
    - min-SNR / debiased weights from all_snr[t]        (lines 140-166)
    and ``rectified_flow.py``: uniform-time sigma sampling (26-47) and
    log-sigma interpolation back to fractional timesteps (98-129).
    """

    def __init__(self, prediction_type="epsilon", target_type=None):
        import torch

        self.torch = torch
        betas = (
            np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64)
            ** 2
        )
        acp = np.cumprod(1.0 - betas)
        self.alphas_cumprod = torch.tensor(acp, dtype=torch.float32)
        self.sigmas = torch.sqrt(
            (1 - self.alphas_cumprod) / self.alphas_cumprod
        )
        self.all_snr = self.alphas_cumprod / (1 - self.alphas_cumprod)
        # Anchor the oracle to published diffusers SDXL EulerDiscreteScheduler
        # constants (neither side's author wrote these): sigma_max ~ 14.6146,
        # sigma_min ~ 0.029168, alphas_cumprod endpoints.
        assert abs(float(self.sigmas[-1]) - 14.6146) < 5e-4, float(self.sigmas[-1])
        assert abs(float(self.sigmas[0]) - 0.0291675) < 1e-6, float(self.sigmas[0])
        assert abs(float(self.alphas_cumprod[0]) - 0.99915) < 1e-6
        assert abs(float(self.alphas_cumprod[-1]) - 0.0046601) < 1e-6
        self.prediction_type = prediction_type
        self.target_type = target_type or prediction_type

    def _append_dims(self, x, ndim):
        return x.reshape(x.shape + (1,) * (ndim - x.ndim))

    def noise_latents(self, x0, noise, sigmas):
        s = self._append_dims(sigmas, x0.ndim)
        return (x0 + noise * s) / (s**2 + 1) ** 0.5

    def velocity(self, x0, noise, timesteps):
        acp = self.alphas_cumprod[timesteps]
        a = self._append_dims(acp.sqrt(), x0.ndim)
        b = self._append_dims((1 - acp).sqrt(), x0.ndim)
        return a * noise - b * x0

    def get_target(self, x0, noise, timesteps):
        if self.target_type == "epsilon":
            return noise
        if self.target_type == "v_prediction":
            return self.velocity(x0, noise, timesteps)
        if self.target_type == "sample":
            return x0
        if self.target_type == "rectified_flow":
            return noise - x0
        raise ValueError(self.target_type)

    def get_x0_eps(self, xt, model_output, sigmas):
        s = self._append_dims(sigmas, xt.ndim)
        scales = 1 / (s**2 + 1) ** 0.5
        p = self.prediction_type
        if p == "sample":
            x0 = model_output
            eps = (xt / scales - x0) / s
        elif p == "epsilon":
            eps = model_output
            x0 = xt / scales - s * eps
        elif p == "v_prediction":
            x0 = scales * (xt - s * model_output)
            eps = (xt / scales - x0) / s
        elif p == "rectified_flow":
            x0 = (xt / scales - s * model_output) / (1 + s)
            eps = (xt / scales + model_output) / (1 + s)
        else:
            raise ValueError(p)
        return x0, eps

    def per_sample_loss(self, x0, noise, timesteps, sigmas, model_output, xt):
        if self.prediction_type == self.target_type:
            pred = model_output
        else:
            px0, peps = self.get_x0_eps(xt, model_output, sigmas)
            if self.target_type == "rectified_flow":
                pred = peps - px0
            else:
                pred = self.get_target(px0, peps, timesteps)
        target = self.get_target(x0, noise, timesteps)
        return ((pred - target) ** 2).flatten(start_dim=1).mean(dim=1)

    def min_snr_weight(self, timesteps, gamma=5.0):
        snr = self.all_snr[timesteps]
        m = self.torch.minimum(snr, self.torch.full_like(snr, gamma))
        if self.prediction_type == "v_prediction":
            return m / (snr + 1)
        return m / snr

    def debiased_weight(self, timesteps):
        snr = self.torch.minimum(
            self.all_snr[timesteps], self.torch.full_like(
                self.all_snr[timesteps], 1000.0
            )
        )
        return 1 / snr.sqrt()

    def sigma_to_timestep(self, sigmas):
        """log-sigma interpolation (``rectified_flow.py:98-129``)."""
        t = self.torch
        log_s = t.log(sigmas.clamp(min=1e-10))
        grid = t.log(self.sigmas)
        dists = log_s[..., None] - grid  # [B, N]
        low = (dists >= 0).sum(dim=-1).clamp(max=grid.shape[0] - 1) - 1
        low = low.clamp(0, grid.shape[0] - 2)
        high = low + 1
        w = ((grid[low] - log_s) / (grid[low] - grid[high])).clamp(0, 1)
        return (1 - w) * low + w * high


# --------------------------------------------------------------------
# identical tiny MLP denoiser, torch + jax
# --------------------------------------------------------------------


def init_mlp(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w1": (rng.standard_normal((DIM + 1, HIDDEN)) / np.sqrt(DIM + 1)).astype(
            np.float32
        ),
        "b1": np.zeros(HIDDEN, np.float32),
        "w2": (rng.standard_normal((HIDDEN, DIM)) / np.sqrt(HIDDEN)).astype(
            np.float32
        ),
        "b2": np.zeros(DIM, np.float32),
    }


def torch_mlp_forward(params, xt, timesteps):
    import torch

    b = xt.shape[0]
    feats = torch.cat(
        [xt.reshape(b, -1), (timesteps.float() / 1000.0)[:, None]], dim=1
    )
    h = torch.nn.functional.silu(feats @ params["w1"] + params["b1"])
    out = h @ params["w2"] + params["b2"]
    return out.reshape(xt.shape)


def jax_mlp_forward(params, xt, timesteps):
    import jax
    import jax.numpy as jnp

    b = xt.shape[0]
    feats = jnp.concatenate(
        [xt.reshape(b, -1), (timesteps.astype(jnp.float32) / 1000.0)[:, None]],
        axis=1,
    )
    h = jax.nn.silu(feats @ params["w1"] + params["b1"])
    out = h @ params["w2"] + params["b2"]
    return out.reshape(xt.shape)


# --------------------------------------------------------------------
# the parity run
# --------------------------------------------------------------------


def draw_data(config, rng):
    """Pre-draw every random quantity once, shared by both sides."""
    oracle = TorchOracle()  # only for sigma tables
    data = []
    for _ in range(STEPS):
        x0 = rng.standard_normal((BATCH, *SHAPE)).astype(np.float32)
        noise = rng.standard_normal((BATCH, *SHAPE)).astype(np.float32)
        if config["time_sampling"] == "uniform_time":
            sigma_max = float(oracle.sigmas[-1])
            max_time = sigma_max / (1 + sigma_max)
            time = rng.uniform(0, max_time, BATCH).astype(np.float32)
            sigmas = time / (1 - time)
            timesteps = None  # derived per-side from sigma
        else:
            timesteps = rng.integers(0, 1000, BATCH)
            sigmas = None
        data.append((x0, noise, timesteps, sigmas))
    return data


def run_torch(config, data):
    import torch

    oracle = TorchOracle(config["pred"], config["target"])
    params = {k: torch.tensor(v, requires_grad=True) for k, v in init_mlp().items()}
    opt = torch.optim.SGD(params.values(), lr=LR)
    losses = []
    for x0, noise, timesteps, sigmas in data:
        x0_t = torch.tensor(x0)
        noise_t = torch.tensor(noise)
        if sigmas is None:
            ts = torch.tensor(timesteps, dtype=torch.long)
            sg = oracle.sigmas[ts]
        else:
            sg = torch.tensor(sigmas)
            ts = oracle.sigma_to_timestep(sg)
        xt = oracle.noise_latents(x0_t, noise_t, sg)
        out = torch_mlp_forward(params, xt, ts)
        per = oracle.per_sample_loss(x0_t, noise_t, ts.long() if sigmas is None else ts, sg, out, xt)
        if config.get("min_snr"):
            per = per * oracle.min_snr_weight(ts.long())
        if config.get("debiased"):
            per = per * oracle.debiased_weight(ts.long())
        loss = per.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return np.asarray(losses)


def run_jax(config, data):
    import jax
    import jax.numpy as jnp

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule

    sched = NoiseSchedule.sdxl()
    loss_obj = DiffusionLoss(
        schedule=sched,
        prediction_type=config["pred"],
        target_type=config["target"],
        use_snr_weight=bool(config.get("min_snr")),
        use_debiased_estimation=bool(config.get("debiased")),
    )
    params = {k: jnp.asarray(v) for k, v in init_mlp().items()}

    @jax.jit
    def step(params, x0, noise, timesteps, sigmas):
        def loss_fn(p):
            xt = loss_obj.noise_latents(x0, noise, sigmas)
            out = jax_mlp_forward(p, xt, timesteps)
            pred = loss_obj.get_prediction_for_training(
                xt, out, timesteps, sigmas
            )
            if config["target"] == "rectified_flow" and config["pred"] != "rectified_flow":
                px0, peps = loss_obj.get_x0_eps_from_pred_with_sigmas(
                    xt, out, sigmas
                )
                pred = peps - px0
            target = loss_obj.get_target(x0, noise, timesteps)
            per = ((pred - target) ** 2).reshape(x0.shape[0], -1).mean(1)
            if config.get("min_snr"):
                per = loss_obj.apply_snr_weight(per, sigmas)
            if config.get("debiased"):
                per = loss_obj.apply_debiased_estimation(per, sigmas)
            return per.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - LR * g, params, grads)
        return params, loss

    losses = []
    for x0, noise, timesteps, sigmas in data:
        x0_j = jnp.asarray(x0)
        noise_j = jnp.asarray(noise)
        if sigmas is None:
            ts = jnp.asarray(timesteps, jnp.int32)
            sg = sched.sigma_for_timestep(ts)
        else:
            sg = jnp.asarray(sigmas)
            ts = sched.sigma_to_t(sg)
        params, loss = step(params, x0_j, noise_j, ts, sg)
        losses.append(float(loss))
    return np.asarray(losses)


CONFIGS = [
    {"name": "epsilon", "pred": "epsilon", "target": "epsilon",
     "time_sampling": "uniform_timestep"},
    {"name": "v_prediction", "pred": "v_prediction", "target": "v_prediction",
     "time_sampling": "uniform_timestep"},
    {"name": "rectified_flow (uniform_time)", "pred": "rectified_flow",
     "target": "rectified_flow", "time_sampling": "uniform_time"},
    {"name": "epsilon + min-SNR", "pred": "epsilon", "target": "epsilon",
     "time_sampling": "uniform_timestep", "min_snr": True},
    {"name": "epsilon + debiased", "pred": "epsilon", "target": "epsilon",
     "time_sampling": "uniform_timestep", "debiased": True},
    {"name": "v-pred model, eps target", "pred": "v_prediction",
     "target": "epsilon", "time_sampling": "uniform_timestep"},
]


def main():
    out_md = Path(__file__).resolve().parent.parent / "PARITY_CURVES.md"
    rows = []
    curves = {}
    for cfg in CONFIGS:
        rng = np.random.default_rng(1215)
        data = draw_data(cfg, rng)
        lt = run_torch(cfg, data)
        lj = run_jax(cfg, data)
        rel = np.abs(lt - lj) / np.maximum(np.abs(lt), 1e-12)
        rows.append((cfg["name"], float(lt[-1]), float(lj[-1]),
                     float(rel.max()), float(rel.mean())))
        curves[cfg["name"]] = (lt, lj)
        print(f"{cfg['name']:32s} max_rel={rel.max():.3e} "
              f"mean_rel={rel.mean():.3e}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(15, 8))
        for ax, (name, (lt, lj)) in zip(axes.flat, curves.items()):
            ax.plot(lt, label="torch oracle (reference math)", lw=2)
            ax.plot(lj, label="uwudiff_tpu", lw=1, ls="--")
            ax.set_title(name)
            ax.set_yscale("log")
            ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(out_md.parent / "assets_parity_curves.png", dpi=100)
        plot_note = "Overlaid curves: `assets_parity_curves.png`."
    except Exception as e:  # pragma: no cover
        plot_note = f"(plot skipped: {e})"

    lines = [
        "# Loss-curve parity: uwudiff_tpu vs reference math (torch oracle)",
        "",
        "Both sides train an identical tiny MLP denoiser (copied weights,",
        f"plain SGD lr={LR}, fp32) for {STEPS} steps on identical pre-drawn",
        "data/noise/timesteps, per parameterization. The torch oracle",
        "re-implements the reference's exact formulas",
        "(`duwu/loss/diffusion.py:40-193`, `rectified_flow.py:26-129`);",
        "see `scripts/parity_curves.py`.",
        "",
        "| configuration | torch final loss | jax final loss | max rel dev | mean rel dev |",
        "|---|---|---|---|---|",
    ]
    for name, lt_f, lj_f, mx, mn in rows:
        lines.append(
            f"| {name} | {lt_f:.6f} | {lj_f:.6f} | {mx:.3e} | {mn:.3e} |"
        )
    lines += [
        "",
        plot_note,
        "",
        "## Notes",
        "",
        "- Deviations are fp32 accumulation-order noise; the curves are",
        "  visually indistinguishable (see plot).",
        "- Reference `DiffusionLoss.forward` passes the CLEAN latent `x`",
        "  into `get_prediction_for_training` (`duwu/loss/diffusion.py:176`)",
        "  where the noisy latent `x_t` is mathematically required; the slot",
        "  is only exercised when `prediction_type != target_type`, which no",
        "  reference config uses. We implement the correct `x_t` semantics",
        "  (and therefore intentionally do NOT bit-match that code path —",
        "  the 'v-pred model, eps target' row compares against the oracle's",
        "  corrected math).",
    ]
    out_md.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
