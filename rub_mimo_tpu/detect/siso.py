"""SISO (single-stream) detection: per-subcarrier scalar division.

Replaces execute_siso_decode (mimo/framing.cc:508-533): the selected rx
stream's frequency-domain symbols are divided by the scalar channel
G[sc][siso_rx][siso_tx]; enabled by SISO/SISO_TX/SISO_RX
(mimo/config.h:89-91, setters framing.cc:888-896).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def siso_equalize(
    Y: jax.Array, G: jax.Array, siso_rx: int, siso_tx: int
) -> jax.Array:
    """Y: [..., n_streams, n_sc] rx symbols; G: [n_sc, rx, tx].

    Returns [..., n_sc]: Y[siso_rx] / G[:, siso_rx, siso_tx].
    """
    g = G[:, siso_rx, siso_tx]
    return (Y[..., siso_rx, :] / g[None, :]).astype(jnp.complex64)
