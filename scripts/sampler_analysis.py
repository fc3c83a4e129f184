"""Why does per-image sampler cost bottom out so early in batch size?

Separates the two candidate causes by measuring, per batch size:

1. the bare CFG-doubled UNet forward (the sampler's inner work):
   wall ms, achieved TFLOP/s from the compiled step's cost analysis,
   and the implied MFU on this chip
2. the full jitted sampler loop's per-step time (euler, 16 steps)

If (1) saturates (flat TFLOP/s) while per-image time grows, the UNet
is compute-saturated and larger batches can't help; if (2) diverges
from (1), the loop itself (ancestral noise, sigma indexing, CFG
split/combine) is adding per-step overhead.

Usage: python scripts/sampler_analysis.py  (chip must be free)
env: SA_MODEL=sd15|sdxl (default sd15), SA_BS="1,2,4,8,16"
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init

from uwudiff_tpu.diffusion import NoiseSchedule  # noqa: E402
from uwudiff_tpu.models.unet import UNet2DConditionModel  # noqa: E402
from uwudiff_tpu.sampling import (  # noqa: E402
    KDiffusionDenoiser,
    sample_euler_ancestral,
)

MODEL = os.environ.get("SA_MODEL", "sd15")
BSS = [int(b) for b in os.environ.get("SA_BS", "1,2,4,8,16").split(",")]
LATENT = int(os.environ.get("SA_LATENT", "64"))


def _peak_flops() -> float:
    import bench

    return bench._device_peak_flops_bf16() or 197e12


def main():
    unet = UNet2DConditionModel.from_config(MODEL, dtype=jnp.bfloat16)
    sched = NoiseSchedule.sd15()
    ctx_dim = unet.cross_attention_dim
    rng = jax.random.PRNGKey(0)

    def added_cond_for(n):
        if getattr(unet, "addition_embed_type", None) != "text_time":
            return None
        pooled_dim = (
            unet.projection_class_embeddings_input_dim
            - 6 * unet.addition_time_embed_dim
        )
        return {
            "time_ids": jnp.tile(
                jnp.asarray([[1024.0, 1024, 0, 0, 1024, 1024]], jnp.float32),
                (n, 1),
            ),
            "text_embeds": jnp.zeros((n, pooled_dim), jnp.float32),
        }

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    from uwudiff_tpu.ops.attention import flash_disabled

    with jax.default_device(cpu), flash_disabled():
        params = unet.init(
            rng,
            jnp.zeros((1, LATENT, LATENT, 4)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, ctx_dim)),
            None,
            added_cond_for(1),
        )["params"]
    params = jax.device_put(params, jax.devices()[0])
    peak = _peak_flops()
    n_steps = 16
    sigmas = sched.sample_sigmas_descending(n_steps)

    print(
        f"# {MODEL} {LATENT}x{LATENT} latents, CFG batch = 2*bs, "
        f"peak={peak/1e12:.0f} TF/s",
        flush=True,
    )
    print("# bs | fwd ms | fwd TF/s | fwd MFU | ms/img | loop ms/step | gap")
    for bs in BSS:
        n = 2 * bs  # CFG doubling
        x = jnp.zeros((n, LATENT, LATENT, 4), jnp.bfloat16)
        t = jnp.full((n,), 400.0)
        ctx = jnp.zeros((n, 77, ctx_dim), jnp.bfloat16)
        added = added_cond_for(n)

        fwd = jax.jit(
            lambda p, x, t, c: unet.apply(
                {"params": p}, x, t, c, None, added
            )
        )
        lowered = fwd.lower(params, x, t, ctx)
        compiled = lowered.compile()
        flops = compiled.cost_analysis()["flops"]
        compiled(params, x, t, ctx).block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = compiled(params, x, t, ctx)
        out.block_until_ready()
        fwd_ms = (time.perf_counter() - t0) / reps * 1e3
        tfs = flops / (fwd_ms / 1e3) / 1e12

        @jax.jit
        def run(params, rng, bs=bs):
            def cfg_model(xx, sigma, sigma_cond=None):
                den = KDiffusionDenoiser(
                    model_fn=lambda z, tt, **kw: unet.apply(
                        {"params": params}, z, tt,
                        jnp.zeros((z.shape[0], 77, ctx_dim), jnp.bfloat16),
                        None, added_cond_for(z.shape[0]),
                    ),
                    schedule=sched,
                )
                o = den(
                    jnp.concatenate([xx, xx]),
                    jnp.concatenate([sigma, sigma]),
                )
                cond, uncond = jnp.split(o, 2)
                return uncond + (cond - uncond) * 3.0, uncond

            init = jax.random.normal(
                rng, (bs, LATENT, LATENT, 4)
            ) * jnp.sqrt(1 + sigmas[0] ** 2)
            return sample_euler_ancestral(cfg_model, init, sigmas, rng=rng)

        run(params, rng).block_until_ready()
        t0 = time.perf_counter()
        loops = 3
        for i in range(loops):
            out = run(params, jax.random.fold_in(rng, i))
        out.block_until_ready()
        loop_ms = (time.perf_counter() - t0) / loops / n_steps * 1e3

        print(
            f"{bs:4d} | {fwd_ms:6.1f} | {tfs:8.1f} | {tfs/ (peak/1e12):7.3f} "
            f"| {fwd_ms/bs:6.2f} | {loop_ms:12.1f} | {loop_ms - fwd_ms:+.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
