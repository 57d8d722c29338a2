"""Carrier-frequency-offset estimation (coarse + residual).

The reference never corrects CFO (the FIXME at mimo/framing.cc:486); the
rebuild provides a two-stage data-aided estimator:

  coarse   — from the Schmidl&Cox correlation phase at the sync point
             (sync.schmidl_cox.synchronize): angle(P)/pi subcarrier units,
             unambiguous to +/-1 subcarrier spacing.
  residual — from the phase progression of the matched-filter correlation
             peaks across the TDMA access codes: consecutive codes of the
             same TX stream sit exactly num_streams*symbol_len samples
             apart, so a residual offset eps (subcarriers) advances their
             correlation phase by 2*pi*eps*num_streams*symbol_len/M per
             step.  Averaging the conjugate products over all (rx, tx,
             code) pairs gives a low-variance estimate with an
             unambiguous range of +/- M/(2*num_streams*symbol_len)
             subcarriers — exactly the residual left after coarse
             correction.

pipeline.rx applies coarse correction before the matched filter when
cfg.correct_cfo is set; residual_cfo() is the refinement hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.ofdm import preamble
from rub_mimo_tpu.utils import gather


def access_code_peak_phasors(
    window: jax.Array, ac_index: jax.Array, cfg: ModemConfig
) -> jax.Array:
    """Complex correlation value at each access-code peak.

    window:   [streams, W]
    ac_index: [rx, codes*streams] absolute window offsets
    returns:  [rx, codes, tx] complex64 — sum_n w[off+n] conj(tmpl[tx][n])
    """
    t = preamble.tables(cfg)
    S = cfg.num_streams
    M = cfg.M
    codes = cfg.num_access_codes

    offs = ac_index.reshape(S, codes, S)  # [rx, code, tx]

    # template row for flat element k = (rx, code, tx): tmpl[tx, code]
    rx_ids = np.repeat(np.arange(S), codes * S)
    code_ids = np.tile(np.repeat(np.arange(codes), S), S)
    tx_ids = np.tile(np.arange(S), S * codes)
    tmpl = np.asarray(t.s1_unnormalized)[tx_ids, code_ids]  # [S*codes*S, M]

    wins = gather.slice_windows(
        window, jnp.asarray(rx_ids), offs.reshape(-1), M
    )  # [S*codes*S, M]
    vals = jnp.sum(jnp.conj(jnp.asarray(tmpl)) * wins, axis=-1)
    return vals.reshape(S, codes, S)


def s0_halves_cfo(
    window: jax.Array, s0_index: jax.Array, cfg: ModemConfig
) -> jax.Array:
    """Coarse CFO from the S0 symbol's repeated halves at a known offset.

    The classic Schmidl&Cox estimator evaluated at the matched-filter's S0
    location: P = sum_n conj(w[p+n]) w[p+M/2+n], eps = angle(P)/pi
    (subcarrier units, unambiguous to +/-1).  Used when sync came from the
    S0-xcorr fallback — the plateau scan's correlation (the usual coarse
    source) is garbage when the plateau never fired.  Summed over rx
    streams (energy-weighted noncoherent combining is unnecessary: the
    phase is common).
    """
    M = cfg.M
    M2 = M // 2
    S = cfg.num_streams

    segs = gather.slice_windows(
        window, jnp.arange(S), s0_index.astype(jnp.int32), M
    )  # [S, M]
    ps = jnp.sum(jnp.conj(segs[:, :M2]) * segs[:, M2:], axis=-1)
    return (jnp.angle(jnp.sum(ps)) / np.pi).astype(jnp.float32)


def residual_cfo(
    window: jax.Array, ac_index: jax.Array, cfg: ModemConfig
) -> jax.Array:
    """Residual CFO in subcarrier units from code-to-code peak phase
    advance (see module docstring).  Scalar float32."""
    S = cfg.num_streams
    sym = cfg.symbol_len
    ph = access_code_peak_phasors(window, ac_index, cfg)  # [rx, code, tx]
    # conjugate product between consecutive codes of the same tx stream,
    # energy-weighted average over everything
    step = jnp.sum(ph[:, 1:, :] * jnp.conj(ph[:, :-1, :]))
    dphi = jnp.angle(step)  # phase advance over S*sym samples
    eps = dphi * cfg.M / (2.0 * np.pi * S * sym)
    return eps.astype(jnp.float32)
