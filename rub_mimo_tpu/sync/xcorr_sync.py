"""S0 cross-correlation sync fallback (low-SNR acquisition).

The reference's plateau detector requires the S&C metric to exceed 0.95
(mimo/config.h:87), whose theoretical ceiling is (SNR/(1+SNR))^2 — so it
cannot acquire below roughly 16 dB SNR.  This module adds a data-aided
fallback: normalized matched filtering of the whole capture against the
known S0 time template, which keeps acquiring tens of dB lower (the
processing gain is the full M-sample correlation).

The returned sync_index emulates the plateau semantics: with the S0 body
starting at peak p, sync_index = p + M - cp_len keeps the replay window
one symbol ahead of the frame and every access code inside its search
lane (see pipeline.rx's window derivation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.ofdm import preamble
from rub_mimo_tpu.utils.movsum import moving_sum


class XcorrSyncResult(NamedTuple):
    peak_index: jax.Array      # int32 — S0 body start estimate
    sync_index: jax.Array      # int32 — plateau-equivalent sync index
    quality: jax.Array         # float32 — normalized correlation in [0, 1]


def _fft_len(n: int) -> int:
    return 1 << (n - 1).bit_length()


def normalized_s0_score(ext: jax.Array, cfg: ModemConfig, n_pos: int) -> jax.Array:
    """Normalized S0 matched-filter score, the ONE shared implementation
    for the offline / streaming / sharded fallback detectors.

    ext: [streams, >= n_pos + M - 1] samples; returns score[j] in [0, 1]
    for windows ext[j : j+M), j < n_pos:

        score[j] = sum_rx |corr_j|^2 / (sum_rx energy_j * ||s0||^2)

    (Cauchy-Schwarz-normalized, noncoherently combined over rx streams.)
    Windows reaching past ext's end read implicit zeros via FFT padding.
    """
    t = preamble.tables(cfg)
    M = cfg.M
    tmpl = jnp.asarray(t.s0_unnormalized)  # ifft_fftw(S0)
    e_tmpl = jnp.sum(jnp.abs(tmpl) ** 2).astype(jnp.float32)

    L = _fft_len(ext.shape[-1] + M)
    Xf = jnp.fft.fft(ext, n=L, axis=-1)
    Tf = jnp.fft.fft(tmpl, n=L)
    c = jnp.fft.ifft(Xf * jnp.conj(Tf)[None, :], axis=-1)[:, :n_pos]
    c2 = (jnp.real(c) ** 2 + jnp.imag(c) ** 2).astype(jnp.float32)

    # e_fwd[j] = energy of ext[j .. j+M-1]
    e_in = (jnp.real(ext) ** 2 + jnp.imag(ext) ** 2).astype(jnp.float32)
    e_win = moving_sum(e_in, M)  # energy of ext[i-M+1 .. i]
    e_fwd = jnp.roll(e_win, -(M - 1), axis=-1)[:, :n_pos]
    # NOISE-REFERENCED denominator floor: windows over SILENT spans
    # (zero padding, inter-burst gaps, decode_all's erased regions) have
    # ~zero measured energy but pick up FFT-roundtrip residue in c2, so
    # a bare epsilon lets score = residue/eps explode to ~1e12 and
    # outvote the real peak (round-4 regression when shard_capture
    # started zero-padding).  Round 4 floored at 1e-6 * max(den), but a
    # max-referenced floor also deflates any GENUINE window more than
    # 60 dB below the largest window energy (weak burst + strong
    # interferer).  Round 5: floor at 1e-2 of the MEDIAN nonzero window
    # energy — the noise level itself — which leaves every at-or-above-
    # noise window untouched at any dynamic range (a burst riding on an
    # interferer has at least the interferer's window energy, which is
    # what the median tracks) while still capping silent-window residue
    # scores.  An all-zero input has exactly zero c2, so the 1e-20
    # keeps that case 0/eps = 0.
    den = jnp.sum(e_fwd, axis=0) * e_tmpl
    mx = jnp.max(den)
    nz = den > 1e-12 * mx
    n_nz = jnp.sum(nz)
    med = jnp.sort(jnp.where(nz, den, jnp.inf))[
        jnp.clip(n_nz // 2, 0, den.shape[-1] - 1)
    ]
    med = jnp.where(n_nz > 0, med, mx)
    floor = 1e-2 * med
    return jnp.sum(c2, axis=0) / jnp.maximum(den, floor + 1e-20)


def s0_xcorr_sync(x: jax.Array, cfg: ModemConfig) -> XcorrSyncResult:
    """Normalized S0 matched filter over the whole capture.

    x: [streams, T].  Correlations from all rx streams are summed in
    power (noncoherent combining) so any mixing channel that delivers S0
    energy to at least one antenna acquires.
    """
    M = cfg.M
    S, T = x.shape
    score = normalized_s0_score(x, cfg, T)
    # exclude the tail where the window runs off the capture
    valid = jnp.arange(T) < (T - M)
    score = jnp.where(valid, score, 0.0)
    p = jnp.argmax(score).astype(jnp.int32)
    return XcorrSyncResult(
        peak_index=p,
        sync_index=(p + M - cfg.cp_len).astype(jnp.int32),
        quality=score[p],
    )
