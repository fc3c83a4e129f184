#!/usr/bin/env python
"""60-second hardware smoke of the flash kernels (fwd+bwd+bias paths)
on tiny shapes — catches Mosaic lowering gaps that interpret-mode CPU
tests cannot (the round-5 GN-bwd lesson). Run before green-lighting an
expensive compile queue that traces these kernels."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from uwudiff_tpu.ops.flash_attention import flash_attention

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (1, 256, 2, 40), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 256, 2, 40), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 256, 2, 40), jnp.bfloat16)

    def ref(q, k, v, bias=None):
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) * (40 ** -0.5)
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))

    # no-bias path (has_bias=False kernels)
    out = np.asarray(flash_attention(q, k, v).astype(jnp.float32))
    expect = np.asarray(ref(q, k, v))
    np.testing.assert_allclose(out, expect, atol=3e-2)
    print("fwd no-bias ok")

    # key-bias path + grad
    bias = jnp.where(
        jnp.arange(256)[None, None, None, :] < 200, 0.0, -1e30
    )
    g = jax.grad(
        lambda q: (
            flash_attention(q, k, v, bias=bias).astype(jnp.float32) ** 2
        ).sum()
    )(q)
    g_ref = jax.grad(
        lambda q: (ref(q, k, v, bias=bias) ** 2).sum()
    )(q)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(g_ref, np.float32),
        atol=0.25, rtol=0.1,
    )
    print("bwd key-bias ok")

    # lse path (ring inner step)
    out2, lse = flash_attention(q, k, v, return_lse=True)
    np.asarray(out2)
    assert np.isfinite(np.asarray(lse)).all()
    print("lse path ok")
    print("FLASH SMOKE PASS")


if __name__ == "__main__":
    sys.exit(main())
