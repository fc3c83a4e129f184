"""Optimizers.

``build_optimizer`` maps config names (including the torch dotted paths
the reference configs use, e.g. ``torch.optim.AdamW`` in
``configs/demo_training.yaml:49``) to optax transforms.

``adamw_fp16_state`` is the TPU counterpart of the reference's
``AdamWFP16`` (``duwu/trainer/optimizers.py``): half-precision moment
storage (memory), fp32 math (stability), denominator-only bias
correction, and stochastic accumulated weight decay applied once the
per-parameter accumulator crosses a threshold.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "build_optimizer",
    "adamw_fp16_state",
    "AdamWFP16State",
    "adamw_factored",
    "stochastic_round_add",
]


def stochastic_round_add(param: jnp.ndarray, update, key) -> jnp.ndarray:
    """``param + update`` stochastically rounded back to bf16.

    TPU-idiomatic low-memory parameter storage: keep master params in
    bfloat16 and compensate the lost mantissa bits by rounding each
    update stochastically (unbiased in expectation), so sub-ulp updates
    still accumulate.  Implementation: compute in fp32, add a uniform
    16-bit integer below the bf16 mantissa cut, truncate to bf16.
    """
    assert param.dtype == jnp.bfloat16, param.dtype
    x = param.astype(jnp.float32) + jnp.asarray(update, jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    hi = ((bits + noise) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def adamw_factored(
    learning_rate: float | Callable,
    b1: float = 0.9,
    b2: float = 0.999,  # accepted for config compat; see decay_rate note
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    min_dim_size_to_factor: int = 128,
    moment_dtype=jnp.bfloat16,
    decay_rate: float = 0.8,
    clipping_threshold: float | None = None,
) -> optax.GradientTransformation:
    """Memory-lean AdamW-style optimizer: bf16 first moment + factored
    second moment.

    The single-chip recipe for SDXL-scale (2.6B-param) full fine-tunes
    on 16GB HBM: the second moment is stored as Adafactor-style row/col
    statistics (negligible memory) while the first moment is kept dense
    in ``moment_dtype``.  Combine with bf16 params + stochastic-rounding
    updates (``DMTrainer(param_dtype="bfloat16")``).

    Built from optax.adafactor configured AdamW-like: momentum=b1, no
    per-parameter scale multiplication, decoupled weight decay.  NOTE:
    the second moment uses Adafactor's time-dependent decay
    beta2_t = 1 - t**(-decay_rate) — ``b2`` is accepted for config
    compatibility but intentionally unused.

    ``clipping_threshold`` enables Adafactor's PER-LEAF update-RMS
    clipping — the memory-free substitute for global-norm gradient
    clipping, which forces the entire gradient tree live at once
    (~5.1GB for SDXL; measured as the difference between bs=6 and bs=8
    fitting a 16GB chip).

    Weight decay is applied LR-SCALED (torch-AdamW semantics:
    ``p -= lr * wd * p``), NOT via optax.adafactor's
    ``weight_decay_rate`` — that knob adds ``wd * p`` to the update
    AFTER the learning-rate stage, i.e. a raw 1%-per-step parameter
    shrink at wd=0.01 that drives any long run to zero weights
    regardless of lr. Found by the round-5 convergence A/B: the
    factored arms collapsed to mean-prediction (loss -> 1.0 as
    params -> 0) while the optax.adamw control converged
    (hw_logs/conv08_*, hw_logs/collapse_repro.txt).
    """
    del b2
    base = optax.adafactor(
        learning_rate=learning_rate,
        min_dim_size_to_factor=min_dim_size_to_factor,
        decay_rate=decay_rate,
        multiply_by_parameter_scale=False,
        clipping_threshold=clipping_threshold,
        momentum=b1,
        dtype_momentum=moment_dtype,
        weight_decay_rate=None,
        eps=max(eps, 1e-30),
        factored=True,
    )
    if not weight_decay:
        return base

    lr_fn = (
        learning_rate if callable(learning_rate)
        else (lambda _count: learning_rate)
    )

    def decay_init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def decay_update(updates, state, params=None):
        assert params is not None, "lr-scaled decay needs params"
        lr = lr_fn(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p: u - lr * weight_decay * p.astype(u.dtype),
            updates, params,
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.chain(
        base, optax.GradientTransformation(decay_init, decay_update)
    )


class AdamWFP16State(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any  # half-precision first moments
    exp_avg_sq: Any  # half-precision second moments
    accumulated_decay: Any  # fp32 scalar per leaf


def adamw_fp16_state(
    learning_rate: float | Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    moment_dtype=jnp.bfloat16,
    decay_threshold: float = 1e-2,
) -> optax.GradientTransformation:
    """AdamW with half-precision moments.

    Matches ``adamw_make_step`` (``duwu/trainer/optimizers.py:96-120``):
    - moments updated in fp32, stored in ``moment_dtype``
    - ``denom_correction = sqrt(1 - b2**step)`` only (no b1 correction)
    - weight decay accumulates per-parameter (``wd * lr`` per step) and
      fires as ``p -= accum * p`` when it exceeds ``decay_threshold``,
      with a randomized per-leaf phase so updates don't synchronize.

    On TPU the half dtype defaults to bfloat16 (native); pass
    ``jnp.float16`` for bit-parity with the reference's ``.half()``.
    """

    def lr_at(count):
        return learning_rate(count) if callable(learning_rate) else learning_rate

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        # deterministic per-leaf phase in [0, decay_threshold)
        keys = jax.random.split(jax.random.PRNGKey(0), max(len(leaves), 1))
        it = iter(keys)

        def phase(_):
            return (
                jax.random.uniform(next(it), ()) * decay_threshold
            ).astype(jnp.float32)

        return AdamWFP16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=moment_dtype), params
            ),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=moment_dtype), params
            ),
            accumulated_decay=jax.tree_util.tree_map(phase, params),
        )

    def update_fn(grads, state, params=None):
        assert params is not None, "adamw_fp16_state needs params"
        step = state.step + 1
        lr = lr_at(step - 1)
        denom_correction = jnp.sqrt(1.0 - b2 ** step.astype(jnp.float32))

        new_m = jax.tree_util.tree_map(
            lambda g, m: m.astype(jnp.float32) * b1
            + g.astype(jnp.float32) * (1 - b1),
            grads,
            state.exp_avg,
        )
        new_v = jax.tree_util.tree_map(
            lambda g, v: v.astype(jnp.float32) * b2
            + jnp.square(g.astype(jnp.float32)) * (1 - b2),
            grads,
            state.exp_avg_sq,
        )

        accum_pre = jax.tree_util.tree_map(
            lambda a: a + weight_decay * jnp.asarray(lr, jnp.float32),
            state.accumulated_decay,
        )
        decay_now = jax.tree_util.tree_map(
            lambda a: jnp.where(a > decay_threshold, a, 0.0), accum_pre
        )
        new_accum = jax.tree_util.tree_map(
            lambda a, d: a - d, accum_pre, decay_now
        )

        def delta(m, v, p, d):
            upd = -lr * denom_correction * m / (jnp.sqrt(v) + eps)
            upd = upd - d * p.astype(jnp.float32)
            return upd.astype(p.dtype)

        updates = jax.tree_util.tree_map(delta, new_m, new_v, params, decay_now)
        new_state = AdamWFP16State(
            step=step,
            exp_avg=jax.tree_util.tree_map(
                lambda m: m.astype(moment_dtype), new_m
            ),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda v: v.astype(moment_dtype), new_v
            ),
            accumulated_decay=new_accum,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


# torch dotted-path aliases for config compatibility with the reference
_ALIASES = {
    "torch.optim.AdamW": "adamw",
    "torch.optim.Adam": "adam",
    "torch.optim.SGD": "sgd",
    "lion_pytorch.Lion": "lion",
    "duwu.trainer.optimizers.AdamWFP16": "adamw_fp16",
    "uwudiff_tpu.training.optimizers.adamw_fp16_state": "adamw_fp16",
}


def build_optimizer(
    name: str = "adamw",
    learning_rate: float | Callable = 1e-5,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    **kwargs,
) -> optax.GradientTransformation:
    name = _ALIASES.get(name, name)
    b1, b2 = betas
    if name == "adamw":
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            **kwargs,
        )
    if name == "adam":
        return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps, **kwargs)
    if name == "adamw_fp16":
        return adamw_fp16_state(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            **kwargs,
        )
    if name == "adamw_factored":
        return adamw_factored(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            **kwargs,
        )
    if name == "lion":
        return optax.lion(
            learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, **kwargs
        )
    if name == "sgd":
        return optax.sgd(learning_rate, **kwargs)
    if name == "adafactor":
        return optax.adafactor(learning_rate, **kwargs)
    raise ValueError(f"Unknown optimizer {name!r}")
