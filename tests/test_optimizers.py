"""Memory-lean optimizer pieces: stochastic rounding + factored AdamW.

These back the single-chip SDXL full-fine-tune recipe
(bf16 params + SR updates + adamw_factored; see bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.training.optimizers import (
    adamw_factored,
    build_optimizer,
    stochastic_round_add,
)


def test_stochastic_round_add_unbiased():
    # an update far below the bf16 ulp must survive in expectation
    p = jnp.full((20000,), 1.0, jnp.bfloat16)  # ulp(1.0) = 2^-7 in bf16
    upd = jnp.full((20000,), 1e-3, jnp.float32)  # ~1/8 ulp
    out = stochastic_round_add(p, upd, jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16
    mean = float(jnp.mean(out.astype(jnp.float32)))
    # deterministic round-to-nearest would give exactly 1.0
    np.testing.assert_allclose(mean, 1.001, rtol=1e-2)
    # every element is one of the two bracketing bf16 values
    vals = np.unique(np.asarray(out.astype(jnp.float32)))
    assert len(vals) <= 2


def test_stochastic_round_add_exact_when_representable():
    p = jnp.zeros((64,), jnp.bfloat16)
    upd = jnp.full((64,), 0.5, jnp.float32)  # exactly representable
    out = stochastic_round_add(p, upd, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out, np.float32), 0.5)


def test_stochastic_round_accumulates_small_updates():
    # 200 steps of +1e-3 on p=1.0: plain bf16 round-to-nearest would stay
    # frozen at 1.0 forever; SR must track the true sum ~1.2 on average.
    p = jnp.full((4096,), 1.0, jnp.bfloat16)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def step(p, k):
        return stochastic_round_add(p, jnp.float32(1e-3), k)

    for i in range(200):
        p = step(p, jax.random.fold_in(key, i))
    mean = float(jnp.mean(p.astype(jnp.float32)))
    np.testing.assert_allclose(mean, 1.2, rtol=0.02)


def test_adamw_factored_state_is_small_and_trains():
    import optax

    # 256x256 matrix: factored second moment must be O(rows+cols)
    w = jnp.ones((256, 256), jnp.float32)
    params = {"w": w}
    # RMS-normalized updates move ~lr per step once momentum saturates
    tx = adamw_factored(5e-2, weight_decay=0.0)
    state = tx.init(params)
    state_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(state)
        if hasattr(x, "dtype")
    )
    # dense Adam would need 2 * 256*256*4 = 512KB; factored v is ~2KB and
    # the bf16 momentum 128KB
    assert state_bytes < 200_000, state_bytes

    def loss(p):
        return jnp.mean((p["w"] - 3.0) ** 2)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s

    l0 = float(loss(params))
    for _ in range(100):
        params, state = step(params, state)
    assert float(loss(params)) < l0 * 0.25


def test_build_optimizer_adamw_factored_name():
    tx = build_optimizer("adamw_factored", learning_rate=1e-3)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, state, params)
    assert jnp.all(jnp.isfinite(upd["w"]))


def test_adamw_factored_clipping_threshold_bounds_update_rms():
    """Adafactor-style per-leaf update-RMS clipping — adopted as the
    bench default after the round-5 convergence A/B caught the
    UNCLIPPED factored recipe collapsing at lr 1e-4 while the fp32
    full-Adam control converged (CONVERGENCE.md). The clipped update's
    RMS must never exceed lr * threshold; the unclipped one must be
    able to (a tiny v estimate early in training produces outsized
    update steps — the instability the clip exists to prevent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uwudiff_tpu.training.optimizers import adamw_factored

    params = {"w": jnp.zeros((8, 16), jnp.float32)}
    # adversarial gradient history: one huge step right after tiny ones
    g_small = {"w": jnp.full((8, 16), 1e-6, jnp.float32)}
    g_big = {"w": jnp.full((8, 16), 10.0, jnp.float32)}
    lr = 1e-2

    def run(clip):
        tx = adamw_factored(
            lr, weight_decay=0.0, clipping_threshold=clip
        )
        state = tx.init(params)
        u, state = tx.update(g_small, state, params)
        u, state = tx.update(g_big, state, params)
        return float(
            jnp.sqrt(jnp.mean(jnp.square(u["w"])))
        )

    rms_clipped = run(1.0)
    rms_free = run(None)
    assert rms_clipped <= lr * 1.0 * (1 + 1e-5), rms_clipped
    assert rms_free > rms_clipped, (rms_free, rms_clipped)


def test_adamw_factored_weight_decay_is_lr_scaled():
    """Regression for the round-5 collapse root cause: optax.adafactor's
    weight_decay_rate knob applies wd*p UNSCALED by lr (a 1%/step shrink
    at wd=0.01 — drove every factored-recipe training to zero weights
    and loss -> mean-prediction). adamw_factored must decay
    torch-AdamW-style: p -= lr * wd * p."""
    import jax.numpy as jnp

    from uwudiff_tpu.training.optimizers import adamw_factored

    lr, wd = 1e-2, 0.1
    tx = adamw_factored(lr, weight_decay=wd)
    params = {"w": jnp.full((4, 256), 2.0, jnp.float32)}
    state = tx.init(params)
    zero_g = {"w": jnp.zeros((4, 256), jnp.float32)}
    u, state = tx.update(zero_g, state, params)
    # zero gradient -> the update IS the decay term
    np.testing.assert_allclose(
        np.asarray(u["w"]), -lr * wd * 2.0, rtol=1e-5
    )
    # 2000 steps of decay at lr 1e-4, wd 0.01 must be ~x0.998, not ~x0
    factor = (1.0 - 1e-4 * 0.01) ** 2000
    assert factor > 0.99  # the fixed semantics keep params alive
