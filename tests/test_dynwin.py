"""kernels.dynwin.dynamic_window vs the obvious pad+slice reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from rub_mimo_tpu.kernels.dynwin import dynamic_window


def _ref(x, start, length):
    S, T = x.shape
    out = np.zeros((S, length), x.dtype)
    for j in range(length):
        p = start + j
        if 0 <= p < T:
            out[:, j] = x[:, p]
    return out


@pytest.mark.parametrize("start", [-70, -1, 0, 3, 127, 500, 960, 1000, 1024, 1500])
@pytest.mark.parametrize("dtype", [np.complex64, np.float32])
def test_dynamic_window_matches_reference(start, dtype):
    rng = np.random.default_rng(7)
    T, L = 1024, 300
    if dtype == np.complex64:
        x = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))).astype(dtype)
    else:
        x = rng.standard_normal((2, T)).astype(dtype)
    got = np.asarray(
        dynamic_window(jnp.asarray(x), jnp.int32(start), L, block=256,
                       interpret=True)
    )
    np.testing.assert_array_equal(got, _ref(x, start, L))


def test_dynamic_window_long_window_short_capture():
    # length > T and a start past the end: all paths must read zeros
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 200)) + 1j * rng.standard_normal((2, 200))).astype(np.complex64)
    got = np.asarray(
        dynamic_window(jnp.asarray(x), jnp.int32(150), 400, block=128,
                       interpret=True)
    )
    np.testing.assert_array_equal(got, _ref(np.asarray(x), 150, 400))
