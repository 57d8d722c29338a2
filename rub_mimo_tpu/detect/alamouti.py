"""Alamouti space-time block coding (2x1/2xN) — a new model family.

Transmit diversity WITHOUT channel knowledge at the TX (the reference's
only diversity concept is its dead closed-loop beamforming path).  Per
subcarrier, symbol pairs (s0, s1) are coded over two consecutive OFDM
symbols and two TX antennas:

    time t:    antenna0 -> s0          antenna1 -> s1
    time t+1:  antenna0 -> -conj(s1)   antenna1 -> conj(s0)

With per-rx-antenna channels (h0, h1) constant over the pair, the linear
combiner

    s0_hat = sum_rx [ conj(h0) r_t + h1 conj(r_{t+1}) ] / E
    s1_hat = sum_rx [ conj(h1) r_t - h0 conj(r_{t+1}) ] / E
    E      = sum_rx ( |h0|^2 + |h1|^2 )

achieves full 2x diversity order with maximum-ratio combining across rx
antennas.  The TDMA access-code preamble is unchanged, so the standard LS
estimator supplies (h0, h1) per subcarrier.

Payload data rides ONE logical stream; pid_max must be even.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_pairs(sym: jax.Array) -> jax.Array:
    """Map a single stream of per-subcarrier symbols to 2 antennas.

    sym: [n_sym, n_sc] with n_sym even (pairs along axis 0)
    returns [2(antenna), n_sym, n_sc]
    """
    n_sym, n_sc = sym.shape
    s0 = sym[0::2]  # [n_sym/2, sc]
    s1 = sym[1::2]
    ant0 = jnp.stack([s0, -jnp.conj(s1)], axis=1).reshape(n_sym, n_sc)
    ant1 = jnp.stack([s1, jnp.conj(s0)], axis=1).reshape(n_sym, n_sc)
    return jnp.stack([ant0, ant1]).astype(jnp.complex64)


def combine_pairs(Y: jax.Array, G_occ: jax.Array) -> jax.Array:
    """Alamouti maximum-likelihood linear combining.

    Y:     [n_sym, n_rx, n_sc] received frequency-domain symbols (n_sym even)
    G_occ: [n_sc, n_rx, 2] channel estimate (rx x tx-antenna)
    returns [n_sym, n_sc] — the decoded single stream, pair-interleaved
    """
    n_sym, n_rx, n_sc = Y.shape
    r0 = Y[0::2]  # [P, rx, sc]
    r1 = Y[1::2]
    h0 = G_occ[:, :, 0].T[None, :, :]  # [1, rx, sc]
    h1 = G_occ[:, :, 1].T[None, :, :]
    e = jnp.sum(
        jnp.abs(G_occ[:, :, 0]) ** 2 + jnp.abs(G_occ[:, :, 1]) ** 2, axis=1
    )  # [sc]
    s0 = jnp.sum(jnp.conj(h0) * r0 + h1 * jnp.conj(r1), axis=1) / e[None, :]
    s1 = jnp.sum(jnp.conj(h1) * r0 - h0 * jnp.conj(r1), axis=1) / e[None, :]
    out = jnp.stack([s0, s1], axis=1).reshape(n_sym, n_sc)
    return out.astype(jnp.complex64)
