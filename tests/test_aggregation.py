import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.utils.aggregation import (
    aggregate_embeddings,
    concat_aggregate_embeddings,
    first_aggregate_embeddings,
    split_aggregate_embeddings,
)


def _ref_concat(embeddings, n_elements, pad_value=0.0, pad_to=None):
    """Straight-line numpy reimplementation of the reference loop
    (duwu/utils/aggregation.py:16-40)."""
    max_n = pad_to or max(n_elements)
    b, L = len(n_elements), embeddings.shape[1]
    out = np.full(
        (b, max_n * L, *embeddings.shape[2:]), pad_value, dtype=embeddings.dtype
    )
    start = 0
    for i, n in enumerate(n_elements):
        chunk = embeddings[start : start + n].reshape(n * L, *embeddings.shape[2:])
        out[i, : n * L] = chunk
        start += n
    return out


def test_concat_matches_reference_loop():
    rng = np.random.default_rng(0)
    n_elements = [2, 3, 1]
    embeddings = rng.standard_normal((6, 4, 5)).astype(np.float32)
    got = concat_aggregate_embeddings(jnp.asarray(embeddings), n_elements)
    want = _ref_concat(embeddings, n_elements)
    np.testing.assert_allclose(np.asarray(got), want)


def test_concat_pad_to_n_elements():
    rng = np.random.default_rng(1)
    n_elements = [1, 2]
    embeddings = rng.standard_normal((3, 2, 3)).astype(np.float32)
    got = concat_aggregate_embeddings(
        jnp.asarray(embeddings), n_elements, pad_value=-1.0, pad_to_n_elements=4
    )
    want = _ref_concat(embeddings, n_elements, pad_value=-1.0, pad_to=4)
    assert got.shape == (2, 8, 3)
    np.testing.assert_allclose(np.asarray(got), want)


def test_split_roundtrip():
    rng = np.random.default_rng(2)
    n_elements = [2, 3, 1]
    embeddings = jnp.asarray(rng.standard_normal((6, 4, 5)).astype(np.float32))
    cat = concat_aggregate_embeddings(embeddings, n_elements)
    back = split_aggregate_embeddings(cat, n_elements, sequence_length=4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(embeddings))


def test_first_aggregate():
    rng = np.random.default_rng(3)
    n_elements = [2, 3, 1]
    embeddings = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    got = first_aggregate_embeddings(embeddings, n_elements)
    want = np.stack(
        [np.asarray(embeddings)[0], np.asarray(embeddings)[2], np.asarray(embeddings)[5]]
    )
    np.testing.assert_allclose(np.asarray(got), want)


def test_aggregate_jit_with_traced_counts():
    """concat mode works under jit with traced n_elements + static pad."""
    rng = np.random.default_rng(4)
    embeddings = jnp.asarray(rng.standard_normal((6, 4, 5)).astype(np.float32))

    @jax.jit
    def f(emb, n):
        return aggregate_embeddings(emb, n, mode="concat", pad_to_n_elements=3)

    got = f(embeddings, jnp.array([2, 3, 1]))
    want = _ref_concat(np.asarray(embeddings), [2, 3, 1], pad_to=3)
    np.testing.assert_allclose(np.asarray(got), want)
