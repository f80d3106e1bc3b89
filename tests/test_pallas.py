"""Pallas kernel tests (interpret mode on CPU; same code compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from muscato_tpu.ops import fused
from muscato_tpu.ops import pallas_windows as pw


@pytest.mark.parametrize("width,min_dinuc", [(8, 0), (8, 3), (20, 3), (4, 1)])
def test_pallas_window_queries_match_xla(width, min_dinuc):
    rng = np.random.default_rng(width * 10 + min_dinuc)
    nreads, lmax = 700, 128  # deliberately not a tile multiple
    codes = rng.integers(0, 5, (nreads, lmax)).astype(np.uint8)
    lengths = rng.integers(0, lmax + 1, nreads).astype(np.int32)
    for i in range(nreads):
        codes[i, lengths[i]:] = 0
    q1s = (0, 10, 40)

    k1_x, k2_x, v_x = fused._window_queries(
        jnp.asarray(codes), jnp.asarray(lengths),
        jnp.asarray(np.array(q1s, np.int32)),
        width=width, min_dinuc=min_dinuc,
    )
    k1_p, k2_p, v_p = pw.window_queries_pallas(
        jnp.asarray(codes), jnp.asarray(lengths), q1s,
        width=width, min_dinuc=min_dinuc,
    )
    v_x = np.asarray(v_x)
    np.testing.assert_array_equal(v_x, np.asarray(v_p))
    # Keys only need to agree where the query is valid.
    np.testing.assert_array_equal(np.asarray(k1_x)[v_x], np.asarray(k1_p)[v_x])
    np.testing.assert_array_equal(np.asarray(k2_x)[v_x], np.asarray(k2_p)[v_x])
