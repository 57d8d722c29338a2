"""Blind RX front-end compensation: DC offset and IQ imbalance.

Direct-conversion receivers (the reference's B210s carry an AD9361, whose
quadrature calibration is imperfect) distort the baseband as

    z = mu * y + nu * conj(y) + dc

The conjugate term folds the spectrum's image onto itself: subcarrier k
receives interference from -k at the image-rejection ratio |nu/mu| — a
floor the reference's chain silently inherits from hardware calibration.

Both effects are blindly estimable from second-order statistics because
the OFDM waveform is circular (E[y^2] = 0, E[y] = 0):

    dc  = E[z]
    w   = E[z'^2] / ( E[|z'|^2] + sqrt(E[|z'|^2]^2 - |E[z'^2]|^2) )

with z' = z - dc.  For the mu/nu model this w equals nu/conj(mu) EXACTLY
(substitute and simplify), so one pass of  y = z' - w * conj(z')  cancels
the image completely; the residual mu-scaling is absorbed by channel
estimation.  AWGN is circular, so noise does not bias either moment.

All per-stream, one reduction over the capture — negligible next to sync.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def estimate_frontend(iq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-stream (dc [S] complex64, w [S] complex64) from [S, T] IQ."""
    dc = jnp.mean(iq, axis=-1)
    z = iq - dc[:, None]
    c2 = jnp.mean(z * z, axis=-1)               # E[z^2]
    c1 = jnp.mean(jnp.abs(z) ** 2, axis=-1)     # E[|z|^2]
    root = jnp.sqrt(jnp.maximum(c1 * c1 - jnp.abs(c2) ** 2, 0.0))
    w = c2 / (c1 + root)
    return dc.astype(jnp.complex64), w.astype(jnp.complex64)


@jax.jit
def compensate(iq: jax.Array, dc: jax.Array, w: jax.Array) -> jax.Array:
    """Undo the front-end: (z - dc) - w * conj(z - dc)."""
    z = iq - dc[:, None]
    return (z - w[:, None] * jnp.conj(z)).astype(jnp.complex64)


def decode_with_frontend(iq: jax.Array, cfg):
    """Convenience: blind front-end compensation, then the standard
    decode.  Returns (DecodeResult, dc, w)."""
    from rub_mimo_tpu.pipeline import rx as rx_mod

    dc, w = estimate_frontend(iq)
    return rx_mod.decode(compensate(iq, dc, w), cfg), dc, w
