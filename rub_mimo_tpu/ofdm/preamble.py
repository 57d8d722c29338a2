"""S0 (Schmidl&Cox short) and S1 (access-code) preamble generation.

Reimplements the reference's active (USE_NEW_INIT_S0 / USE_NEW_INIT_S1,
non-QPSK) preamble builders:

  - ofdmframe_init_S0: mimo/framing.cc:1053-1111 — BPSK (+/-1) from one LFSR
    bit per subcarrier on EVEN occupied subcarriers only (odd -> 0), then an
    unnormalized inverse FFT scaled by 1/sqrt(M_S0).
  - ofdmframe_init_S1: mimo/framing.cc:1214-1262 — per access code, one LFSR
    bit per subcarrier mapped through BPSK_CONSTELLATION on every occupied
    subcarrier, inverse FFT scaled by 1/sqrt(M) (note: by M, NOT by the
    occupied count — the reference computes M_S1 but never uses it in this
    variant, framing.cc:1228,1254).

FFT convention: FFTW_BACKWARD is the unnormalized inverse DFT
(x[n] = sum_k X[k] e^{+2pi i nk/M}), i.e. M * numpy ifft.

Tables are deterministic host-side constants (numpy), cached per config.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.ofdm import sctype
from rub_mimo_tpu.ofdm.lfsr import MSequence, lfsr_polys_for_streams


def ifft_fftw(X: np.ndarray, axis: int = -1) -> np.ndarray:
    """FFTW_BACKWARD: unnormalized inverse DFT (= M * numpy ifft)."""
    M = X.shape[axis]
    return np.fft.ifft(X, axis=axis) * M


@dataclasses.dataclass(frozen=True)
class PreambleTables:
    """All deterministic preamble constants for a config.

    S0:       [M] complex64, frequency domain
    s0:       [M] complex64, time domain (normalized by 1/sqrt(M_S0))
    S1:       [num_streams, num_access_codes, M] complex64, frequency domain
    s1:       [num_streams, num_access_codes, M] complex64, time domain
              (normalized by 1/sqrt(M))
    s1_unnormalized: [streams, codes, M] — ifft_fftw(S1) with no scaling;
              this is exactly the matched-filter template the channel
              estimator correlates against (see estimate/matched_filter.py).
    s0_unnormalized: [M] — ifft_fftw(S0), the S0 matched-filter template.
    """

    S0: np.ndarray
    s0: np.ndarray
    S1: np.ndarray
    s1: np.ndarray
    s0_unnormalized: np.ndarray
    s1_unnormalized: np.ndarray
    M_S0: int


def init_S0(p: np.ndarray, ms: MSequence):
    """S0 short-sync symbol. Mirrors framing.cc:1053-1111.

    One LFSR bit is consumed for EVERY subcarrier (null or not); only even
    occupied subcarriers carry +/-1.
    """
    M = len(p)
    bits = ms.generate_bits(M)
    S0 = np.zeros(M, dtype=np.complex64)
    even = (np.arange(M) % 2) == 0
    occupied = p != sctype.SCTYPE_NULL
    active = occupied & even
    S0[active] = np.where(bits[active] != 0, 1.0, -1.0)
    M_S0 = int(active.sum())
    if M_S0 == 0:
        raise ValueError("ofdmframe_init_S0: no subcarriers enabled")
    s0_unnorm = ifft_fftw(S0.astype(np.complex128))
    s0 = (s0_unnorm / np.sqrt(M_S0)).astype(np.complex64)
    return S0, s0, s0_unnorm.astype(np.complex64), M_S0


def init_S1(p: np.ndarray, num_access_codes: int, ms: MSequence):
    """S1 access-code symbols for one TX stream. Mirrors framing.cc:1214-1262.

    Per code: one LFSR bit per subcarrier, BPSK (+/-1) on occupied
    subcarriers, zero on nulls; time domain scaled by 1/sqrt(M).
    """
    M = len(p)
    occupied = p != sctype.SCTYPE_NULL
    S1 = np.zeros((num_access_codes, M), dtype=np.complex64)
    for j in range(num_access_codes):
        bits = ms.generate_bits(M)
        S1[j, occupied] = np.where(bits[occupied] != 0, 1.0, -1.0)
    s1_unnorm = ifft_fftw(S1.astype(np.complex128), axis=-1)
    s1 = (s1_unnorm / np.sqrt(M)).astype(np.complex64)
    return S1, s1, s1_unnorm.astype(np.complex64)


def init_S1_qpsk(p: np.ndarray, num_access_codes: int, ms: MSequence):
    """The reference's compiled-out MAKE_S1_QPSK variant of
    ofdmframe_init_S1 (framing.cc:1160-1212), quirks replicated exactly:

      - two LFSR bits are consumed per subcarrier (nulls included), but
        the result is masked with `& 0x11` (framing.cc:1188) — hex 17,
        surely intended as binary 0b11 — so only bit 0 survives and only
        QPSK_CONSTELLATION entries 0 and 1 are ever emitted;
      - the time-domain normalization is 1/sqrt(M_S1) (occupied count,
        framing.cc:1204), where the BPSK variant divides by sqrt(M).
    """
    from rub_mimo_tpu.ofdm.constellation import QPSK_REFERENCE_TABLE

    M = len(p)
    occupied = p != sctype.SCTYPE_NULL
    S1 = np.zeros((num_access_codes, M), dtype=np.complex64)
    m_s1 = int(occupied.sum())
    for j in range(num_access_codes):
        for i in range(M):
            s = ms.generate_symbol(2) & 0x11  # verbatim reference mask
            if occupied[i]:
                S1[j, i] = QPSK_REFERENCE_TABLE[s]
    s1_unnorm = ifft_fftw(S1.astype(np.complex128), axis=-1)
    s1 = (s1_unnorm / np.sqrt(m_s1)).astype(np.complex64)
    return S1, s1, s1_unnorm.astype(np.complex64)


@functools.lru_cache(maxsize=16)
def _tables_cached(key) -> PreambleTables:
    cfg: ModemConfig = key
    p = cfg.subcarrier_allocation()
    ms_s0 = MSequence(cfg.lfsr_small_length, cfg.lfsr_small_poly, 1)
    S0, s0, s0_un, M_S0 = init_S0(p, ms_s0)

    polys = lfsr_polys_for_streams(cfg)
    s1_builder = init_S1_qpsk if cfg.s1_qpsk else init_S1
    S1s, s1s, s1_uns = [], [], []
    for stream in range(cfg.num_streams):
        ms = MSequence(cfg.lfsr_large_length, polys[stream], 1)
        S1, s1, s1_un = s1_builder(p, cfg.num_access_codes, ms)
        S1s.append(S1)
        s1s.append(s1)
        s1_uns.append(s1_un)
    return PreambleTables(
        S0=S0,
        s0=s0,
        S1=np.stack(S1s),
        s1=np.stack(s1s),
        s0_unnormalized=s0_un,
        s1_unnormalized=np.stack(s1_uns),
        M_S0=M_S0,
    )


def tables(cfg: ModemConfig) -> PreambleTables:
    return _tables_cached(cfg)
