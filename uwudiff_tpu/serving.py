"""Serving: a pre-compiled text-to-image pipeline.

Production-deployment counterpart of the reference's ad-hoc sampling
scripts (``test_scripts/test_sampling.py``): bind params once, compile
the full prompt->latents->image program per (resolution, batch, steps)
signature, and serve requests against the warm cache. Works with the
persistent compilation cache so process restarts stay hot.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data.utils import vae_image_postprocess
from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling import diffusion_sampling, sample_euler_ancestral

__all__ = ["Txt2ImgPipeline", "BatchingServer", "Request",
           "ServerOverloaded"]


class Txt2ImgPipeline:
    def __init__(
        self,
        unet_fn: Callable,  # (params, x, t, ctx, mask, added) -> eps if
        # unet_params given, else (x, t, ctx, mask, added) with params bound
        te_pipeline,  # TextEncodingPipeline
        vae_decode: Callable | None,  # latents -> [-1,1] images, params bound
        schedule: NoiseSchedule,
        vae_std: float = 1.0,
        vae_mean: float = 0.0,
        vae_downscale: int = 8,
        latent_channels: int = 4,
        sampler: Callable = sample_euler_ancestral,
        unet_params=None,
        # multi-chip serving: NamedSharding for the latent batch
        latent_sharding=None,
        # pass sampling.lcm.LCMDenoiser (+ sampler=sample_lcm, cfg 1)
        # to serve a consistency-distilled student in ~4 steps
        denoiser_cls: type | None = None,
        # int8 weight-only storage (ops/quantize.py): halves the HBM
        # weight traffic of the (bandwidth-bound) small-batch sampler;
        # requires unet_params (params-as-argument mode)
        quantize_weights: bool = False,
    ):
        base_params_pre_quant = unet_params
        _requantize = None
        if quantize_weights:
            if unet_params is None:
                raise ValueError(
                    "quantize_weights=True needs unet_params (the "
                    "params-as-jit-argument mode)"
                )
            from uwudiff_tpu.ops.quantize import (
                dequantize_tree,
                quantize_tree,
            )

            _requantize = quantize_tree
            unet_params = quantize_tree(unet_params)
            base_fn = unet_fn

            def unet_fn(params, *args):  # dequant INSIDE the jit
                return base_fn(dequantize_tree(params), *args)

        self.unet_fn = unet_fn
        self.unet_params = unet_params
        self.te = te_pipeline
        self.vae_decode = (
            jax.jit(vae_decode) if vae_decode is not None else None
        )
        # device-side [-1,1]->uint8: the serving path fetches 4x fewer
        # bytes over the device link (u8 vs f32) and skips the host
        # clip/scale per image
        self.vae_decode_u8 = (
            jax.jit(
                lambda lat: (
                    (jnp.clip(vae_decode(lat), -1.0, 1.0) + 1.0) * 127.5
                ).astype(jnp.uint8)
            )
            if vae_decode is not None
            else None
        )
        self._sigma_cache: dict[int, Any] = {}
        self.schedule = schedule
        self.vae_std = vae_std
        self.vae_mean = vae_mean
        self.vae_downscale = vae_downscale
        self.latent_channels = latent_channels
        self.sampler = sampler
        self.denoiser_cls = denoiser_cls
        self.latent_sharding = latent_sharding
        # --- zero-retrace request path + adapter hot-swap state ---
        # params are jit ARGUMENTS, so swapping an adapter-merged tree
        # of identical structure/dtypes reuses the compiled executable.
        self._base_params = base_params_pre_quant
        self._quantized_base = unet_params if quantize_weights else None
        self._requantize = _requantize
        self._adapters: dict[str, Any] = {}
        self._active_adapter: tuple[str, ...] | None = None
        self._compiled: dict[tuple, Callable] = {}
        self._trace_counts: dict[tuple, int] = {}

    @property
    def trace_count(self) -> int:
        """Total sampler traces so far (observability: a steady-state
        server should see this stop growing)."""
        return sum(self._trace_counts.values())

    # -- adapter hot-swap (LyCORIS) --

    def register_adapter(self, name: str, adapter) -> "Txt2ImgPipeline":
        """Register a :class:`training.adapters.LycorisAdapter` (e.g.
        ``trainer.adapter`` after an adapter fine-tune, or
        ``adapter.load(path)``) for by-name swapping."""
        self._adapters[name] = adapter
        return self

    def set_adapter(self, adapter=None) -> "Txt2ImgPipeline":
        """Swap the served weights WITHOUT recompiling.

        ``adapter`` is ``None`` (restore the base model), a registered
        name, a ``LycorisAdapter``, or a sequence of those (merged in
        order — multi-adapter composition). The merged tree has the
        same structure/dtypes as the base, and params are passed to the
        compiled sampler as arguments, so the swap costs one tree-add
        (plus re-quantization when ``quantize_weights=True``) and zero
        retraces/recompiles.
        """
        if self._base_params is None:
            raise ValueError(
                "set_adapter needs the params-as-jit-argument mode "
                "(construct with unet_params)"
            )
        items = (
            [] if adapter is None
            else list(adapter) if isinstance(adapter, (list, tuple))
            else [adapter]
        )
        names = tuple(
            a if isinstance(a, str) else f"<adapter@{id(a):x}>"
            for a in items
        )
        # idempotent by-name swaps are free (anonymous adapter objects
        # always re-merge: a recycled id must not alias a stale tree)
        if items and all(isinstance(a, str) for a in items):
            if names == self._active_adapter:
                return self
        if not items:
            if self._active_adapter is None:
                return self
            self.unet_params = (
                self._quantized_base
                if self._quantized_base is not None
                else self._base_params
            )
            self._active_adapter = None
            return self
        merged = self._base_params
        for a in items:
            if isinstance(a, str):
                a = self._adapters[a]
            merged = a.merge(merged)
        self.unet_params = (
            self._requantize(merged) if self._requantize else merged
        )
        self._active_adapter = names
        return self

    @classmethod
    def from_trainer(
        cls, trainer, vae_tiling: int | None = None, **kwargs
    ) -> "Txt2ImgPipeline":
        """Build from a (possibly adapter-)trained DMTrainer. On a
        meshed trainer the params keep their FSDP/TP shardings and the
        latent batch is constrained over the data-like axes — the
        compiled sampler is a multi-chip GSPMD program."""
        from uwudiff_tpu.models.text_encoders import TextEncodingPipeline

        unet_params = trainer.merged_unet_params()
        if trainer.mesh is not None and "latent_sharding" not in kwargs:
            from uwudiff_tpu.parallel.mesh import batch_sharding

            kwargs["latent_sharding"] = batch_sharding(trainer.mesh)
        if "denoiser_cls" not in kwargs:
            # parameterization lock-step with the training loss (RF ->
            # RFDenoiser, v_prediction -> VDenoiser, eps -> default)
            from uwudiff_tpu.sampling import denoiser_for_loss

            kwargs["denoiser_cls"] = denoiser_for_loss(trainer.loss)

        def unet_fn(params, x, t, ctx, mask, added):
            return trainer.unet.apply({"params": params}, x, t, ctx, mask, added)

        te_pipe = TextEncodingPipeline(
            trainer.te, trainer.frozen["te"], trainer.tokenizers
        )
        vae_decode = None
        if trainer.vae is not None:
            vae_params = trainer.frozen["vae"]

            if vae_tiling:
                # overlapping-tile decode (models/vae.py::decode_tiled):
                # bounds decoder activations to the tile footprint for
                # large-resolution serving; `vae_tiling` = latent tile
                def vae_decode(latents):
                    return trainer.vae.apply(
                        {"params": vae_params}, latents, tile=vae_tiling,
                        method=trainer.vae.decode_tiled,
                    )
            else:
                def vae_decode(latents):
                    return trainer.vae.apply(
                        {"params": vae_params}, latents,
                        method=trainer.vae.decode,
                    )

        downs = (
            2 ** (len(trainer.vae.block_out_channels) - 1)
            if trainer.vae is not None
            else 8
        )
        return cls(
            unet_fn,
            te_pipe,
            vae_decode,
            schedule=trainer.loss.schedule,
            vae_std=trainer.vae_std if trainer.vae_std is not None else 1.0,
            vae_mean=trainer.vae_mean,
            vae_downscale=downs,
            unet_params=unet_params,
            **kwargs,
        )

    def _compiled_sampler(self, key) -> Callable:
        """One persistent jitted sampler per static signature. Prompt
        encodings, sigmas, rngs AND params are jit *arguments*, so new
        prompts / adapter swaps / step-count-preserving schedule changes
        reuse the executable with zero retraces — ``diffusion_sampling``
        by contrast builds (and traces) a fresh closure per call."""
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        (num_samples, height, width, num_steps, cfg_scale,
         cfg_rescale) = key
        from uwudiff_tpu.sampling.cfg import build_cfg_fn
        from uwudiff_tpu.sampling.noise import (
            batch_fallback_rng,
            make_per_sample_noise_sampler,
            per_sample_init_noise,
            per_sample_keys,
            supports_noise_sampler,
        )
        from uwudiff_tpu.sampling.wrapper import KDiffusionDenoiser

        denoiser_cls = self.denoiser_cls or KDiffusionDenoiser
        unet_fn, sampler = self.unet_fn, self.sampler
        schedule, latent_sharding = self.schedule, self.latent_sharding
        down, ch = self.vae_downscale, self.latent_channels
        vae_std, vae_mean = self.vae_std, self.vae_mean
        stochastic = supports_noise_sampler(sampler)

        def run(params, enc, sigmas, seeds):
            self._trace_counts[key] = self._trace_counts.get(key, 0) + 1

            def eps_fn(x, t, **kw):
                args = (
                    x,
                    t,
                    kw.get("encoder_hidden_states"),
                    kw.get("encoder_attention_mask"),
                    kw.get("added_cond"),
                )
                return (
                    unet_fn(params, *args)
                    if params is not None
                    else unet_fn(*args)
                )

            wrapper = denoiser_cls(
                model_fn=eps_fn, schedule=schedule, quantize=False
            )
            cfg_fn = build_cfg_fn(wrapper, enc, cfg_scale, cfg_rescale)
            # per-sample seed isolation (sampling/noise.py): lane j's
            # whole trajectory depends on seeds[j] only, so requests
            # batched together by the server reproduce independently
            keys = per_sample_keys(seeds)
            init_x = per_sample_init_noise(
                keys, (height // down, width // down, ch)
            ) * jnp.sqrt(1 + sigmas[0] ** 2)
            if latent_sharding is not None:
                init_x = jax.lax.with_sharding_constraint(
                    init_x, latent_sharding
                )
            kw = (
                {"noise_sampler": make_per_sample_noise_sampler(keys)}
                if stochastic
                else {}
            )
            # samplers without noise_sampler support fall back to a
            # seed-derived batch rng (lane isolation is then NOT
            # guaranteed across batch compositions — all built-in
            # stochastic samplers DO support noise_sampler)
            latents = sampler(
                cfg_fn, init_x, sigmas, rng=batch_fallback_rng(keys), **kw
            )
            return latents * vae_std + vae_mean

        fn = jax.jit(run)
        self._compiled[key] = fn
        return fn

    def __call__(
        self,
        prompt: str | list[str],
        neg_prompt: str | list[str] = "",
        num_steps: int = 16,
        num_samples: int = 1,
        cfg_scale: float = 3.0,
        width: int = 1024,
        height: int = 1024,
        seed: int = 42,
        return_latents: bool = False,
        prompt_weighting: bool = False,
        long_prompt: bool = False,
        cfg_rescale: float = 0.0,
        **kwargs: Any,
    ):
        if kwargs:  # exotic options: the per-call diffusion_sampling path
            return diffusion_sampling(
                self.unet_fn,
                self.te,
                self.vae_decode,
                train_schedule=self.schedule,
                prompt=prompt,
                neg_prompt=neg_prompt,
                num_steps=num_steps,
                num_samples=num_samples,
                cfg_scale=cfg_scale,
                width=width,
                height=height,
                seed=seed,
                vae_std=self.vae_std,
                vae_mean=self.vae_mean,
                vae_downscale=self.vae_downscale,
                latent_channels=self.latent_channels,
                internal_sampling_func=self.sampler,
                return_latents=return_latents,
                unet_params=self.unet_params,
                latent_sharding=self.latent_sharding,
                prompt_weighting=prompt_weighting,
                long_prompt=long_prompt,
                cfg_rescale=cfg_rescale,
                **(
                    {"denoiser_cls": self.denoiser_cls}
                    if self.denoiser_cls is not None
                    else {}
                ),
                **kwargs,
            )

        out, is_images = self.sample_device(
            prompt, neg_prompt, num_steps=num_steps,
            num_samples=num_samples, cfg_scale=cfg_scale,
            width=width, height=height, seed=seed,
            return_latents=return_latents,
            prompt_weighting=prompt_weighting, long_prompt=long_prompt,
            cfg_rescale=cfg_rescale,
        )
        if not is_images:
            return out
        return [vae_image_postprocess(img) for img in np.asarray(out)]

    def sample_device(
        self,
        prompt,
        neg_prompt="",
        num_steps: int = 16,
        num_samples: int = 1,
        cfg_scale: float = 3.0,
        width: int = 1024,
        height: int = 1024,
        seed=42,
        return_latents: bool = False,
        prompt_weighting: bool = False,
        long_prompt: bool = False,
        cfg_rescale: float = 0.0,
    ):
        """The zero-retrace request path, ASYNC: returns ``(device
        array, is_images)`` without a host sync, so a server can
        overlap the host fetch/encode of one batch with the device
        compute of the next. Numerics identical to
        ``diffusion_sampling`` (same prompt normalization, per-sample
        seed scheme — sampling/noise.py — sigma ladder and init
        scaling). ``seed`` is an int (sample j uses seed+j) or a
        per-sample sequence."""
        from uwudiff_tpu.utils import truncate_or_pad_to_length

        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(neg_prompt, str):
            neg_prompt = [neg_prompt]
        prompt = truncate_or_pad_to_length(
            list(prompt), num_samples, padding_mode="cycling"
        )
        neg_prompt = truncate_or_pad_to_length(
            list(neg_prompt), num_samples, padding_mode="cycling"
        )
        from uwudiff_tpu.sampling.cfg import encode_cfg_inputs
        from uwudiff_tpu.sampling.noise import expand_seeds

        enc = encode_cfg_inputs(
            prompt, neg_prompt, width, height, self.te,
            prompt_weighting=prompt_weighting,
            long_prompt=long_prompt,
        )
        # host-cached sigma ladder: building it eagerly is a handful of
        # device round trips per request on a remote link
        sigmas = self._sigma_cache.get(num_steps)
        if sigmas is None:
            sigmas = np.asarray(
                self.schedule.sample_sigmas_descending(num_steps),
                np.float32,
            )
            self._sigma_cache[num_steps] = sigmas
        seeds = expand_seeds(seed, num_samples)
        key = (num_samples, height, width, num_steps, cfg_scale,
               cfg_rescale)
        latents = self._compiled_sampler(key)(
            self.unet_params, enc, sigmas, seeds
        )
        if return_latents or self.vae_decode is None:
            return latents, False
        return self.vae_decode_u8(latents), True

    def warmup(self, widths_heights_batches: list[tuple[int, int, int]],
               num_steps: int = 16):
        """Pre-compile the serving signatures (cold-start elimination),
        including the u8 VAE decode when images are served."""
        for w, h, b in widths_heights_batches:
            out = self(
                prompt="warmup",
                neg_prompt="",
                num_steps=num_steps,
                num_samples=b,
                width=w,
                height=h,
                return_latents=self.vae_decode is None,
            )
            if not isinstance(out, list):
                np.asarray(out)  # force the compile+run to finish


# ---------------------------------------------------------------------
# continuous-batching service loop
# ---------------------------------------------------------------------

import dataclasses
import queue
import threading
from concurrent.futures import Future


@dataclasses.dataclass
class Request:
    prompt: str
    neg_prompt: str = ""
    width: int = 1024
    height: int = 1024
    num_steps: int = 16
    cfg_scale: float = 3.0
    seed: int = 0
    return_latents: bool = False
    # A1111-style (word:1.3) emphasis in prompt/neg_prompt; host-side
    # only (shape-identical program) but part of the group key so one
    # batch's encode applies one setting
    prompt_weighting: bool = False
    # chunk prompts beyond the CLIP window (models/long_prompt.py);
    # in the group key — the context seq length depends on it
    long_prompt: bool = False
    # a pipeline-registered adapter name (or tuple of names, merged in
    # order), hot-swapped per group with zero recompiles; None = base
    adapter: str | tuple[str, ...] | None = None


class ServerOverloaded(RuntimeError):
    """Admission rejected: the server's unresolved-request load is at
    ``max_queue`` (the HTTP-429 analogue). Clients should back off and
    retry; the bound keeps ACCEPTED requests' latency predictable
    instead of letting the queue (and every p50 behind it) grow without
    limit."""


class BatchingServer:
    """Continuous request batching over a ``Txt2ImgPipeline``.

    Requests land in a queue; a single dispatcher thread drains them,
    groups compatible requests — same resolution bucket, step count, cfg
    scale and output kind (XLA signature compatibility) — into batches
    of up to ``max_batch``, runs ONE compiled program per group, and
    resolves each request's Future with its own image. Requests snap to
    the nearest configured resolution bucket, so the warm compile cache
    covers every signature the server will ever run.

    The accumulation window (``max_wait_s``) trades latency for batch
    efficiency — per-image sampler cost bottoms out around batch 4 on a
    v5e (README sweep), so small windows already capture most of it.

    Backpressure (shed-at-admission policy): at most ``max_queue``
    requests may be unresolved at once — queued, grouped, or in flight
    on device. Beyond that ``submit`` raises :class:`ServerOverloaded`
    immediately rather than queueing unboundedly (the round-4 envelope
    showed pure queueing: p50 8.5s at 32 simultaneous requests).
    Default 8x``max_batch`` bounds admitted-request latency to ~8 group
    times; ``max_queue=None`` restores the unbounded behavior.
    """

    def __init__(
        self,
        pipeline: Txt2ImgPipeline,
        buckets: list[tuple[int, int]] = ((1024, 1024),),
        max_batch: int = 4,
        max_wait_s: float = 0.05,
        # warmed batch-size ladder: a group of n requests runs at the
        # smallest warmed size >= n instead of always padding to
        # max_batch. Default (1, max_batch): a lone request pays the
        # bs=1 sampler (~2.3x lower latency on sd15 than a padded
        # batch-8 run) at the cost of one extra compiled signature per
        # bucket. Pass (max_batch,) for the single-signature behavior.
        batch_sizes: tuple[int, ...] | None = None,
        max_queue: int | str | None = "default",
    ):
        self.pipeline = pipeline
        self.buckets = [tuple(b) for b in buckets]
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.max_queue = (
            8 * max_batch if max_queue == "default" else max_queue
        )
        self._load_lock = threading.Lock()
        self._inflight = 0
        sizes = batch_sizes if batch_sizes is not None else (1, max_batch)
        self.batch_sizes = tuple(sorted({min(int(s), max_batch)
                                         for s in sizes} | {max_batch}))
        self._queue: "queue.Queue[tuple[Request, Future] | None]" = (
            queue.Queue()
        )
        self._thread: threading.Thread | None = None
        self._running = False
        # host fetch/postprocess runs on its own thread so the
        # dispatcher can enqueue the NEXT batch's device work while
        # this batch's images cross the device link (jax dispatch is
        # async; only np.asarray blocks)
        self._fetch_queue: "queue.Queue" = queue.Queue()
        self._fetch_thread: threading.Thread | None = None

    # -- lifecycle --

    def start(self, warmup_steps: int | None = None):
        if warmup_steps:
            self.pipeline.warmup(
                [(w, h, b) for (w, h) in self.buckets
                 for b in self.batch_sizes],
                num_steps=warmup_steps,
            )
        self._running = True
        self._fetch_thread = threading.Thread(
            target=self._fetch_loop, daemon=True
        )
        self._fetch_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._running = False
        self._queue.put(None)
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._fetch_thread is not None:
            self._fetch_queue.put(None)
            self._fetch_thread.join()
            self._fetch_thread = None

    # -- client API --

    def nearest_bucket(self, w: int, h: int) -> tuple[int, int]:
        import math

        # relative (log-space) area + aspect distance, unit-free
        return min(
            self.buckets,
            key=lambda b: abs(math.log((b[0] * b[1]) / (w * h)))
            + abs(math.log((b[0] / b[1]) / (w / h))),
        )

    def load(self) -> int:
        """Unresolved requests right now (queued + grouped + on device)."""
        with self._load_lock:
            return self._inflight

    def _dec_inflight(self, _fut):
        with self._load_lock:
            self._inflight -= 1

    def submit(self, request: Request) -> Future:
        fut: Future = Future()
        if self.max_queue is not None:
            with self._load_lock:
                if self._inflight >= self.max_queue:
                    raise ServerOverloaded(
                        f"server at max_queue={self.max_queue} unresolved "
                        "requests; retry with backoff"
                    )
                self._inflight += 1
            # resolution (result OR exception) releases the slot
            fut.add_done_callback(self._dec_inflight)
        self._queue.put((request, fut))
        return fut

    def generate(self, request: Request):
        """Blocking convenience wrapper."""
        return self.submit(request).result()

    # -- dispatcher --

    def _group_key(self, r: Request):
        w, h = self.nearest_bucket(r.width, r.height)
        # seed is NOT in the key: the pipeline's per-sample seed scheme
        # (sampling/noise.py) gives every request its own noise lanes,
        # so different-seed requests batch together — without this,
        # saturated throughput degenerates to single-request latency
        # (round-3 serve_bench: 0.128 imgs/s, every "batch" one request)
        adapter = (
            (r.adapter,) if isinstance(r.adapter, str) else
            tuple(r.adapter) if r.adapter is not None else None
        )
        return (
            w, h, r.num_steps, r.cfg_scale, r.return_latents,
            r.prompt_weighting, r.long_prompt, adapter,
        )

    def _loop(self):
        import time as _time

        pending: list[tuple[Request, Future]] = []
        while self._running or pending:
            # block for the first request, then accumulate a window
            if not pending:
                item = self._queue.get()
                if item is None:
                    break
                pending.append(item)
            deadline = _time.monotonic() + self.max_wait_s
            while len(pending) < self.max_batch:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is None:
                    self._running = False
                    break
                pending.append(item)

            # take the largest compatible group
            key0 = self._group_key(pending[0][0])
            group = [p for p in pending if self._group_key(p[0]) == key0][
                : self.max_batch
            ]
            pending = [p for p in pending if p not in group]
            self._run_group(key0, group)

        # drained by shutdown: fail any leftovers instead of hanging
        # their waiters forever
        leftovers = pending
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                leftovers.append(item)
        for _, fut in leftovers:
            if not fut.done():
                fut.set_exception(RuntimeError("BatchingServer stopped"))

    def _run_group(self, key, group):
        (w, h, steps, cfg, return_latents, prompt_weighting,
         long_prompt, adapter) = key
        reqs = [r for r, _ in group]
        futs = [f for _, f in group]
        # pad to the smallest warmed batch size that fits so partial
        # groups reuse a precompiled signature instead of cold-
        # compiling one program per group size (lone requests run the
        # bs=1 program rather than a padded max_batch one)
        n_real = len(reqs)
        size = next(
            (s for s in self.batch_sizes if s >= n_real), self.max_batch
        )
        pad = size - n_real
        prompts = [r.prompt for r in reqs] + [reqs[-1].prompt] * pad
        negs = [r.neg_prompt for r in reqs] + [reqs[-1].neg_prompt] * pad
        seeds = [r.seed for r in reqs] + [reqs[-1].seed] * pad
        try:
            if adapter is not None or getattr(
                self.pipeline, "_active_adapter", None
            ) is not None:
                self.pipeline.set_adapter(
                    list(adapter) if adapter is not None else None
                )
            kwargs = dict(
                prompt=prompts,
                neg_prompt=negs,
                num_steps=steps,
                num_samples=size,
                cfg_scale=cfg,
                width=w,
                height=h,
                seed=seeds,
                return_latents=return_latents,
                prompt_weighting=prompt_weighting,
                long_prompt=long_prompt,
            )
            sample_device = getattr(self.pipeline, "sample_device", None)
            if sample_device is not None:
                # async path: enqueue device work, hand the (pending)
                # device arrays to the fetch thread, move on to the
                # next group immediately
                out, is_images = sample_device(**kwargs)
                self._fetch_queue.put((out, is_images, futs))
            else:  # duck-typed pipelines (tests): sync in-thread
                out = self.pipeline(**kwargs)
                for i, fut in enumerate(futs):
                    fut.set_result(out[i])
        except Exception as e:  # pragma: no cover - surfaced to callers
            for fut in futs:
                if not fut.done():
                    fut.set_exception(e)

    def _fetch_loop(self):
        while True:
            item = self._fetch_queue.get()
            if item is None:
                break
            out, is_images, futs = item
            try:
                host = np.asarray(out)  # ONE device->host transfer
                for i, fut in enumerate(futs):
                    fut.set_result(
                        vae_image_postprocess(host[i])
                        if is_images
                        else host[i]
                    )
            except Exception as e:  # pragma: no cover
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)
