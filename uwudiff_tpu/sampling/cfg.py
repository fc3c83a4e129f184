"""Classifier-free-guidance wrappers (parity with
``duwu/sampling/cfg.py``).

Text encoding happens host-side once (through ``TextEncodingPipeline``);
the returned ``model_fn(x, sigma, sigma_cond)`` runs the denoiser on the
doubled cond|uncond batch in a single call and combines with the CFG
scale — exactly ``cfg.py:113-126``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from uwudiff_tpu.utils import append_dims

__all__ = [
    "cond_text_wrapper",
    "cfg_wrapper",
    "default_time_ids",
    "build_class_cfg_fn",
    "build_slg_cfg_fn",
]


def default_time_ids(height: int, width: int, batch: int) -> jnp.ndarray:
    """SDXL micro-conditioning ids: org_h/w, crop, target_h/w
    (``cfg.py:22-27``)."""
    return jnp.tile(
        jnp.asarray(
            [[height, width, 0, 0, height, width]], dtype=jnp.float32
        ),
        (batch, 1),
    )


def _pad_seq(emb, mask, target_len):
    cur = emb.shape[1]
    if cur >= target_len:
        return emb, mask
    emb = jnp.pad(emb, [(0, 0), (0, target_len - cur), (0, 0)])
    if mask is not None:
        mask = jnp.pad(mask, [(0, 0), (0, target_len - cur)])
    return emb, mask


def cond_text_wrapper(
    prompt,
    width: int,
    height: int,
    unet: Callable,  # KDiffusionDenoiser
    te,  # TextEncodingPipeline
    time_ids: jnp.ndarray | None = None,
) -> Callable:
    """Single-conditioning wrapper (no CFG), ``cfg.py:9-51``."""
    emb, normed_emb, pool, mask = te.encode(prompt, padding=True, truncation=True)
    if te.use_normed_ctx:
        emb = normed_emb
    if time_ids is None:
        time_ids = default_time_ids(height, width, emb.shape[0])
    added_cond = (
        {"time_ids": time_ids, "text_embeds": pool} if pool is not None else None
    )

    def model_fn(x, sigma, sigma_cond=None):
        denoised = unet(
            x,
            sigma,
            sigma_cond=sigma_cond,
            encoder_hidden_states=emb,
            encoder_attention_mask=mask,
            added_cond=added_cond,
        )
        return denoised, None

    return model_fn


def encode_cfg_inputs(
    prompt,
    neg_prompt,
    width: int,
    height: int,
    te,  # TextEncodingPipeline
    time_ids: jnp.ndarray | None = None,
    prompt_weighting: bool = False,
    long_prompt: bool = False,
) -> dict:
    """Host-side half of CFG: encode cond/uncond prompts and assemble the
    doubled-batch conditioning tensors (``cfg.py:68-111``).
    ``prompt_weighting=True`` parses ``(emphasis:1.3)`` syntax in BOTH
    prompts (``models/prompt_weights.py``); ``long_prompt=True`` chunks
    beyond the CLIP window — cond and uncond are padded to a COMMON
    window count with empty-prompt windows, so both halves of the
    doubled batch share one shape (``models/long_prompt.py``)."""
    max_chunks = None
    if long_prompt:
        from uwudiff_tpu.models.long_prompt import required_chunks

        max_chunks = max(
            required_chunks(te, prompt), required_chunks(te, neg_prompt)
        )
    # ONE TE forward for cond+uncond (both lists are already padded to
    # a common length by the callers, and CLIP pads/truncates every
    # prompt to its fixed window) — halves the serving-path encode
    # latency vs two calls
    n = len(prompt)
    if len(neg_prompt) == n:
        both = te.encode(
            list(prompt) + list(neg_prompt), padding=True, truncation=True,
            prompt_weighting=prompt_weighting,
            long_prompt=long_prompt, max_chunks=max_chunks,
        )
        emb, normed_emb, pool, mask = (
            None if t is None else t[:n] for t in both
        )
        neg_emb, normed_neg_emb, neg_pool, neg_mask = (
            None if t is None else t[n:] for t in both
        )
    else:  # ragged cond/uncond counts: two forwards
        emb, normed_emb, pool, mask = te.encode(
            prompt, padding=True, truncation=True,
            prompt_weighting=prompt_weighting,
            long_prompt=long_prompt, max_chunks=max_chunks,
        )
        neg_emb, normed_neg_emb, neg_pool, neg_mask = te.encode(
            neg_prompt, padding=True, truncation=True,
            prompt_weighting=prompt_weighting,
            long_prompt=long_prompt, max_chunks=max_chunks,
        )
    if te.use_normed_ctx:
        emb = normed_emb
        neg_emb = normed_neg_emb

    if time_ids is None:
        time_ids = default_time_ids(height, width, 2 * emb.shape[0])
    else:
        time_ids = jnp.tile(jnp.asarray(time_ids), (2, 1))

    if pool is not None:
        added_cond = {
            "time_ids": time_ids,
            "text_embeds": jnp.concatenate([pool, neg_pool]),
        }
    else:
        added_cond = None

    # align sequence lengths (``cfg.py:96-105``)
    target = max(emb.shape[1], neg_emb.shape[1])
    emb, mask = _pad_seq(emb, mask, target)
    neg_emb, neg_mask = _pad_seq(neg_emb, neg_mask, target)

    if mask is not None and neg_mask is not None:
        attn_mask = jnp.concatenate([mask, neg_mask])
    else:
        attn_mask = None
    text_ctx_emb = jnp.concatenate([emb, neg_emb])
    return {
        "ctx": text_ctx_emb,
        "mask": attn_mask,
        "added_cond": added_cond,
    }


def apply_cfg_rescale(cfg_output, cond, rescale: float):
    """CFG rescale (Lin et al. 2023 §3.4): renormalize the guided
    output's per-sample std to the conditional prediction's std, then
    blend by ``rescale`` (phi). Counters the over-saturation/contrast
    blowup of high guidance scales, especially with v-prediction +
    zero-terminal-SNR schedules. ``rescale == 0`` is plain CFG."""
    if rescale == 0.0:
        return cfg_output
    dims = tuple(range(1, cfg_output.ndim))
    std_cond = jnp.std(cond, axis=dims, keepdims=True)
    std_cfg = jnp.std(cfg_output, axis=dims, keepdims=True)
    rescaled = cfg_output * (std_cond / jnp.maximum(std_cfg, 1e-8))
    return rescale * rescaled + (1.0 - rescale) * cfg_output


def build_cfg_fn(
    unet: Callable,
    enc: dict,
    cfg: float,
    cfg_rescale: float = 0.0,
    cfg_interval: tuple[float, float] | None = None,
) -> Callable:
    """Device-side half: the doubled-batch model fn (``cfg.py:113-126``).
    Safe to call inside jit (``enc`` tensors may be traced arguments —
    this is how large params avoid being baked into the program as
    constants). ``cfg == 1`` short-circuits to a single conditional
    pass (no doubled batch) — the few-step consistency-student path
    (guidance baked in at distillation) runs at half the model cost.

    ``cfg_interval=(lo, hi)`` applies guidance only at sigma in
    [lo, hi] (Kynkäänniemi et al. 2024: limiting guidance to the
    middle noise levels improves FID at high scales); outside the
    window the output is the plain conditional prediction. Branchless
    (per-sample jnp.where on the scale) so the compiled loop is
    unchanged — no reference counterpart."""
    if cfg == 1.0:
        n = enc["ctx"].shape[0] // 2

        def cond_fn(x, sigma, sigma_cond=None):
            out = unet(
                x,
                sigma,
                sigma_cond=sigma_cond,
                encoder_hidden_states=enc["ctx"][:n],
                encoder_attention_mask=(
                    enc["mask"][:n] if enc["mask"] is not None else None
                ),
                added_cond=(
                    {k: v[:n] for k, v in enc["added_cond"].items()}
                    if enc["added_cond"] is not None
                    else None
                ),
            )
            return out, out

        return cond_fn

    def cfg_fn(x, sigma, sigma_cond=None):
        if sigma_cond is not None:
            sigma_cond = jnp.concatenate([sigma_cond, sigma_cond])
        out = unet(
            jnp.concatenate([x, x]),
            jnp.concatenate([sigma, sigma]),
            sigma_cond=sigma_cond,
            encoder_hidden_states=enc["ctx"],
            encoder_attention_mask=enc["mask"],
            added_cond=enc["added_cond"],
        )
        cond, uncond = jnp.split(out, 2)
        scale = jnp.asarray(cfg, x.dtype)
        if cfg_interval is not None:
            lo, hi = cfg_interval
            in_window = (sigma >= lo) & (sigma <= hi)
            scale = jnp.where(in_window, cfg, 1.0)
            scale = append_dims(scale, x.ndim)
        cfg_output = uncond + (cond - uncond) * scale
        cfg_output = apply_cfg_rescale(cfg_output, cond, cfg_rescale)
        return cfg_output, uncond

    return cfg_fn


def cfg_wrapper(
    prompt,
    neg_prompt,
    width: int,
    height: int,
    unet: Callable,  # KDiffusionDenoiser
    te,  # TextEncodingPipeline
    cfg: float = 5.0,
    time_ids: jnp.ndarray | None = None,
) -> Callable:
    """CFG wrapper: doubled-batch single call,
    ``out = uncond + (cond - uncond) * cfg`` (``cfg.py:54-127``)."""
    enc = encode_cfg_inputs(prompt, neg_prompt, width, height, te, time_ids)
    return build_cfg_fn(unet, enc, cfg)


def build_class_cfg_fn(
    unet: Callable,  # KDiffusionDenoiser
    class_labels: jnp.ndarray,  # [N] int
    null_label: int,
    cfg: float,
    cfg_rescale: float = 0.0,
) -> Callable:
    """Class-label CFG for the DiT family: the unconditional branch is
    the learned null-class embedding (index ``num_classes``, the same
    embedding CFG label-dropout trains). ``cfg == 1`` short-circuits to
    a single conditional pass (no doubled batch)."""
    class_labels = jnp.asarray(class_labels)

    def cond_fn(x, sigma, sigma_cond=None):
        out = unet(x, sigma, sigma_cond=sigma_cond, class_labels=class_labels)
        return out, out

    if cfg == 1.0:
        return cond_fn

    labels2 = jnp.concatenate(
        [class_labels, jnp.full_like(class_labels, null_label)]
    )

    def cfg_fn(x, sigma, sigma_cond=None):
        if sigma_cond is not None:
            sigma_cond = jnp.concatenate([sigma_cond, sigma_cond])
        out = unet(
            jnp.concatenate([x, x]),
            jnp.concatenate([sigma, sigma]),
            sigma_cond=sigma_cond,
            class_labels=labels2,
        )
        cond, uncond = jnp.split(out, 2)
        cfg_output = uncond + (cond - uncond) * cfg
        return apply_cfg_rescale(cfg_output, cond, cfg_rescale), uncond

    return cfg_fn


def build_slg_cfg_fn(
    unet: Callable,
    unet_skip: Callable,
    enc: dict,
    cfg: float,
    slg_scale: float,
    cfg_rescale: float = 0.0,
    slg_interval: tuple[float, float] | None = None,
) -> Callable:
    """Skip-layer guidance (the published SD3.5-medium sampling recipe):

        out = uncond + cfg*(cond - uncond) + slg*(cond - cond_skip)

    where ``cond_skip`` is a THIRD, conditional-only pass through
    ``unet_skip`` — the same weights with selected joint blocks bypassed
    (``MMDiT(skip_layers=...)``); the degraded prediction acts as an
    extra negative direction. 1.5x the model cost of plain CFG per
    step. ``slg_interval=(lo, hi)`` restricts the extra term to sigma
    in the window (SD3.5 applies it only over early-middle steps);
    outside it this is exactly :func:`build_cfg_fn`'s output.
    """
    n = enc["ctx"].shape[0] // 2
    cond_enc = {
        "ctx": enc["ctx"][:n],
        "mask": enc["mask"][:n] if enc["mask"] is not None else None,
        "added_cond": (
            {k: v[:n] for k, v in enc["added_cond"].items()}
            if enc["added_cond"] is not None
            else None
        ),
    }

    def slg_fn(x, sigma, sigma_cond=None):
        sc2 = (
            jnp.concatenate([sigma_cond, sigma_cond])
            if sigma_cond is not None
            else None
        )
        out = unet(
            jnp.concatenate([x, x]),
            jnp.concatenate([sigma, sigma]),
            sigma_cond=sc2,
            encoder_hidden_states=enc["ctx"],
            encoder_attention_mask=enc["mask"],
            added_cond=enc["added_cond"],
        )
        cond, uncond = jnp.split(out, 2)
        cond_skip = unet_skip(
            x,
            sigma,
            sigma_cond=sigma_cond,
            encoder_hidden_states=cond_enc["ctx"],
            encoder_attention_mask=cond_enc["mask"],
            added_cond=cond_enc["added_cond"],
        )
        slg = jnp.asarray(slg_scale, x.dtype)
        if slg_interval is not None:
            lo, hi = slg_interval
            in_window = (sigma >= lo) & (sigma <= hi)
            slg = append_dims(
                jnp.where(in_window, slg_scale, 0.0), x.ndim
            )
        cfg_output = (
            uncond + (cond - uncond) * cfg + (cond - cond_skip) * slg
        )
        cfg_output = apply_cfg_rescale(cfg_output, cond, cfg_rescale)
        return cfg_output, uncond

    return slg_fn
