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


def test_flash_custom_call_flops_estimated():
    """Pallas flash custom calls contribute analytic matmul FLOPs to
    matmul_flops_from_hlo (kernel role from result arity: fwd 2 /
    dq 3 / dkv 4 matmuls) — without this every flash program
    under-reports mfu_matmul."""
    import importlib.util
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "sp_test", Path(__file__).parent.parent / "scripts" /
        "step_profile.py",
    )
    sp = importlib.util.module_from_spec(spec)
    sys.modules["sp_test"] = sp
    spec.loader.exec_module(sp)

    opn = 'op_name="jit(f)/attn1/dot_product_attention/pallas_call[x]"'
    args = ("bf16[160,1024,64]{2,1,0} %p0, bf16[160,1024,64]{2,1,0} %p1, "
            "bf16[160,1024,64]{2,1,0} %p2")
    fwd = (f"%custom-call.1 = (bf16[160,1024,64]{{2,1,0}}, "
           f"f32[160,1,1024]{{2,1,0}}) custom-call({args}), "
           f'custom_call_target="tpu_custom_call", {opn}')
    dq = (f"%custom-call.2 = bf16[160,1024,64]{{2,1,0}} "
          f'custom-call({args}), custom_call_target="tpu_custom_call", '
          f"{opn}")
    dkv = (f"%custom-call.3 = (bf16[160,1024,64]{{2,1,0}}, "
           f"bf16[160,1024,64]{{2,1,0}}) custom-call({args}), "
           f'custom_call_target="tpu_custom_call", {opn}')
    per, calls = sp.matmul_flops_from_hlo("\n".join([fwd, dq, dkv]))
    unit = 2 * 160 * 1024 * 1024 * 64
    got = sorted(int(f / unit) for f, kind, *_ in per if kind == "flash")
    assert got == [2, 3, 4]
    assert sum(calls.values()) == 3
