"""Bit-exact liquid-dsp style m-sequence (Galois LFSR) generator.

The reference generates its S0/S1 preamble pilot sequences with liquid-dsp's
``msequence`` objects (created in mimo/main.cc:1268-1270 with the octal
generator polynomials from mimo/config.h:70-75, consumed in
mimo/framing.cc:1075 and framing.cc:1240).  liquid's algorithm is:

    create(m, g, a):  state v = a;  gg = g >> 1;  mask = (1 << m) - 1
    advance():        b = parity(v & gg);  v = ((v << 1) | b) & mask;  return b
    generate_symbol(bps): fold bps advance() bits MSB-first

This module reproduces that stream exactly, host-side, with precomputed
numpy tables (the preambles are deterministic compile-time constants in the
rebuilt framework, so there is no need for an on-device LFSR).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np


def _parity(x: int) -> int:
    return bin(x).count("1") & 1


class MSequence:
    """liquid-dsp compatible m-sequence generator.

    Parameters mirror ``msequence_create(m, g, a)``:
      m: shift-register length (sequence period 2^m - 1)
      g: generator polynomial as supplied to liquid (liquid internally
         stores g >> 1, dropping the least-significant bit; replicated here)
      a: initial shift-register state (reference always uses 1,
         mimo/main.cc:1268-1270).
    """

    def __init__(self, m: int, g: int, a: int = 1):
        self.m = m
        self.g_full = g
        self._g = g >> 1
        self._mask = (1 << m) - 1
        self._a = a
        self.v = a

    def reset(self) -> None:
        """msequence_reset: restore the initial state (mimo/main.cc:1301)."""
        self.v = self._a

    def advance(self) -> int:
        b = _parity(self.v & self._g)
        self.v = ((self.v << 1) | b) & self._mask
        return b

    def generate_symbol(self, bps: int) -> int:
        s = 0
        for _ in range(bps):
            s = (s << 1) | self.advance()
        return s

    def generate_bits(self, n: int) -> np.ndarray:
        """Return the next n output bits as a uint8 array (vectorized)."""
        out = np.empty(n, dtype=np.uint8)
        v, g, mask = self.v, self._g, self._mask
        for i in range(n):
            b = _parity(v & g)
            v = ((v << 1) | b) & mask
            out[i] = b
        self.v = v
        return out

    @property
    def period(self) -> int:
        return (1 << self.m) - 1


@functools.lru_cache(maxsize=64)
def msequence_bits(m: int, g: int, a: int, n: int) -> Tuple[int, ...]:
    """Cached first-n bits of the (m, g, a) m-sequence."""
    return tuple(MSequence(m, g, a).generate_bits(n).tolist())


def sequence_period(m: int, g: int, a: int = 1) -> int:
    """Actual period of the LFSR state sequence (2^m - 1 iff primitive)."""
    ms = MSequence(m, g, a)
    start = ms.v
    limit = 1 << (m + 1)
    for i in range(1, limit):
        ms.advance()
        if ms.v == start:
            return i
    return limit


@functools.lru_cache(maxsize=8)
def find_primitive_polys(m: int, count: int, skip: Tuple[int, ...] = ()) -> Tuple[int, ...]:
    """Deterministically find `count` degree-m primitive polynomials.

    Used to extend the reference's two degree-13 polynomials
    (mimo/config.h:74-75) to >2 streams (e.g. the 4x4 configuration).
    Candidates are scanned in increasing numeric order; a polynomial is
    accepted iff its LFSR state sequence has full period 2^m - 1.
    """
    found: List[int] = []
    full = (1 << m) - 1
    # candidate has degree-m bit set and constant term set
    for g in range((1 << m) | 1, 1 << (m + 1), 2):
        if g in skip:
            continue
        if sequence_period(m, g) == full:
            found.append(g)
            if len(found) == count:
                break
    return tuple(found)


def lfsr_polys_for_streams(cfg) -> Tuple[int, ...]:
    """Return num_streams degree-`lfsr_large_length` polynomials.

    Uses the configured polynomials first (mimo/config.h:74-75) and extends
    deterministically with extra primitive polynomials when the stream count
    exceeds the configured list (new capability for 4x4 MIMO).
    """
    polys = list(cfg.lfsr_large_polys[: cfg.num_streams])
    if len(polys) < cfg.num_streams:
        extra = find_primitive_polys(
            cfg.lfsr_large_length,
            cfg.num_streams,  # upper bound; filtered below
            skip=tuple(cfg.lfsr_large_polys),
        )
        for g in extra:
            if g not in polys:
                polys.append(g)
            if len(polys) == cfg.num_streams:
                break
    if len(polys) < cfg.num_streams:
        raise ValueError(
            f"could not find {cfg.num_streams} primitive polynomials of "
            f"degree {cfg.lfsr_large_length}"
        )
    return tuple(polys)
