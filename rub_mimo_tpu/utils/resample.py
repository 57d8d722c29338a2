"""Fractional resampling for sampling-clock (SFO) impairment/correction.

The reference has no SFO handling at all — its two B210s share a 10 MHz
reference via the clock_source setting (mimo/main.cc:270-276), sidestepping
clock offset in hardware.  A file-replay framework must model and correct
it numerically instead.

Two grades:

- resample_linear: one gather + fma, O(T).  Fine for signals with little
  energy near Nyquist, but an all-carriers OFDM waveform (the reference
  default) occupies the FULL band, and linear interpolation's midpoint
  gain at Nyquist is cos(pi/2) = 0 — it silently erases edge subcarriers.
- resample_bandlimited: exact FFT 4x upsampling (zero-stuffed spectrum)
  followed by Catmull-Rom cubic interpolation on the dense grid; worst-bin
  error falls to ~1e-3 amplitude.  This is the one the SFO paths use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def resample_linear(x: jax.Array, factor: float | jax.Array) -> jax.Array:
    """Evaluate x at positions t * factor, t = 0..T-1 (same length out).

    x: [..., T] complex64 or float32.  Positions past the end clamp to the
    last sample (the tail is padding/noise in every use here).

    Precision note: positions are computed as t + t*(factor-1) so the
    fractional part keeps full float32 resolution even at t in the
    millions (t itself is exact below 2^24; the t*(factor-1) correction is
    small for ppm-scale factors) — a naive float32 t*factor would quantize
    the interpolation phase to whole samples beyond t ~ 2^23.
    """
    T = x.shape[-1]
    t = jnp.arange(T, dtype=jnp.float32)
    off = t * (jnp.asarray(factor, jnp.float32) - 1.0)   # small for ~ppm
    shift = jnp.floor(off)
    frac = off - shift
    i0 = jnp.clip(jnp.arange(T, dtype=jnp.int32) + shift.astype(jnp.int32),
                  0, T - 1)
    i1 = jnp.minimum(i0 + 1, T - 1)
    a = x[..., i0]
    b = x[..., i1]
    return (a + (b - a) * frac).astype(x.dtype)


def _fft_upsample(x: jax.Array, up: int) -> jax.Array:
    """Exact band-limited upsampling by integer `up`: zero-stuff the
    spectrum (splitting the Nyquist bin symmetrically for even T)."""
    T = x.shape[-1]
    X = jnp.fft.fft(x.astype(jnp.complex64), axis=-1)
    h = T // 2
    if T % 2 == 0:
        lead = X[..., :h]          # bins 0 .. h-1
        tail = X[..., h + 1 :]     # bins -(h-1) .. -1
        nyq = X[..., h : h + 1] * 0.5
        mid_z = jnp.zeros(x.shape[:-1] + (up * T - T - 1,), X.dtype)
        Xu = jnp.concatenate([lead, nyq, mid_z, nyq, tail], axis=-1)
    else:
        lead = X[..., : h + 1]     # bins 0 .. +h (all positive freqs)
        tail = X[..., h + 1 :]     # bins -h .. -1
        mid_z = jnp.zeros(x.shape[:-1] + (up * T - T,), X.dtype)
        Xu = jnp.concatenate([lead, mid_z, tail], axis=-1)
    return jnp.fft.ifft(Xu, axis=-1) * up


@jax.jit
def resample_bandlimited(
    x: jax.Array, factor: float | jax.Array
) -> jax.Array:
    """Evaluate x at positions t * factor with band-limited accuracy:
    FFT 4x upsample, then Catmull-Rom cubic on the dense grid.  Intended
    for |factor - 1| at ppm..1e-3 scale (the gather index never strays
    more than a few samples from 4t, but any factor works).
    """
    up = 4
    T = x.shape[-1]
    xu = _fft_upsample(x, up)                           # [..., 4T]
    Tu = up * T

    t = jnp.arange(T, dtype=jnp.float32)
    # dense-grid positions 4 * t * factor, split for f32 precision:
    # base 4t is exact; the correction 4t(factor-1) is small
    off = t * (jnp.asarray(factor, jnp.float32) - 1.0) * up
    shift = jnp.floor(off)
    frac = off - shift                                   # in [0, 1)
    i1 = jnp.arange(T, dtype=jnp.int32) * up + shift.astype(jnp.int32)
    i0 = jnp.clip(i1 - 1, 0, Tu - 1)
    i2 = jnp.clip(i1 + 1, 0, Tu - 1)
    i3 = jnp.clip(i1 + 2, 0, Tu - 1)
    i1 = jnp.clip(i1, 0, Tu - 1)

    p0, p1, p2, p3 = xu[..., i0], xu[..., i1], xu[..., i2], xu[..., i3]
    u = frac
    # Catmull-Rom coefficients
    c0 = -0.5 * u * (1 - u) * (1 - u)
    c1 = 1 + u * u * (1.5 * u - 2.5)
    c2 = u * (0.5 + u * (2.0 - 1.5 * u))
    c3 = 0.5 * u * u * (u - 1)
    out = p0 * c0 + p1 * c1 + p2 * c2 + p3 * c3
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        out = jnp.real(out)
    return out.astype(x.dtype)
