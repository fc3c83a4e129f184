"""bench._compiled_step_flops: analytic conv+dot FLOPs vs known shapes."""

import jax
import jax.numpy as jnp

import bench


class _TrainerShim:
    """Minimal duck-type of DMTrainer for _compiled_step_flops."""

    def __init__(self, step, state, frozen):
        self._train_step = jax.jit(step)
        self.state = state
        self.frozen = frozen

    def _put_batch(self, batch):
        return batch


def test_matmul_flops_exact_on_synthetic_step():
    def step(state, frozen, batch, rng):
        y = batch["x"] @ state["w"]
        return (y * y).sum(), None

    t = _TrainerShim(
        step,
        state={"w": jnp.ones((128, 256), jnp.bfloat16)},
        frozen={},
    )
    batch = {"x": jnp.ones((64, 128), jnp.bfloat16)}
    cost_flops, matmul_flops = bench._compiled_step_flops(t, batch)
    assert matmul_flops == 2 * 64 * 128 * 256
    # the cost model adds the elementwise square+sum on top
    assert cost_flops is None or cost_flops >= matmul_flops


def test_conv_flops_counted():
    def step(state, frozen, batch, rng):
        y = jax.lax.conv_general_dilated(
            batch["x"], state["k"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y * y).sum(), None

    t = _TrainerShim(
        step,
        state={"k": jnp.ones((3, 3, 8, 16), jnp.bfloat16)},
        frozen={},
    )
    batch = {"x": jnp.ones((2, 16, 16, 8), jnp.bfloat16)}
    _, matmul_flops = bench._compiled_step_flops(t, batch)
    assert matmul_flops == 2 * 2 * 16 * 16 * 16 * 3 * 3 * 8
