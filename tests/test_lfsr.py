"""LFSR / m-sequence unit tests (liquid-dsp msequence compatibility)."""

import numpy as np
import pytest

from rub_mimo_tpu.config import (
    LFSR_LARGE_0_GEN_POLY,
    LFSR_LARGE_1_GEN_POLY,
    LFSR_SMALL_0_GEN_POLY,
)
from rub_mimo_tpu.ofdm.lfsr import (
    MSequence,
    find_primitive_polys,
    sequence_period,
)


def test_m2_reference_sequence():
    # liquid's default m=2 polynomial 0x7: the classic period-3 sequence
    ms = MSequence(2, 0x7, 1)
    bits = ms.generate_bits(9).tolist()
    assert bits == [1, 0, 1] * 3


def test_reference_polys_are_primitive():
    # The reference's generator polynomials (mimo/config.h:70-75) must
    # produce full-period m-sequences.
    assert sequence_period(12, LFSR_SMALL_0_GEN_POLY) == 2**12 - 1
    assert sequence_period(13, LFSR_LARGE_0_GEN_POLY) == 2**13 - 1
    assert sequence_period(13, LFSR_LARGE_1_GEN_POLY) == 2**13 - 1


def test_balance_property():
    # m-sequences have 2^(m-1) ones per period
    ms = MSequence(12, LFSR_SMALL_0_GEN_POLY, 1)
    bits = ms.generate_bits(2**12 - 1)
    assert int(bits.sum()) == 2**11


def test_reset_replays():
    ms = MSequence(13, LFSR_LARGE_0_GEN_POLY, 1)
    a = ms.generate_bits(100).copy()
    ms.reset()
    b = ms.generate_bits(100)
    np.testing.assert_array_equal(a, b)


def test_generate_symbol_msb_first():
    ms1 = MSequence(12, LFSR_SMALL_0_GEN_POLY, 1)
    ms2 = MSequence(12, LFSR_SMALL_0_GEN_POLY, 1)
    sym = ms1.generate_symbol(3)
    bits = ms2.generate_bits(3)
    assert sym == (bits[0] << 2) | (bits[1] << 1) | bits[2]


def test_find_primitive_polys_extends_deterministically():
    polys = find_primitive_polys(13, 4, skip=(LFSR_LARGE_0_GEN_POLY,))
    assert len(polys) == 4
    assert LFSR_LARGE_0_GEN_POLY not in polys
    for g in polys:
        assert sequence_period(13, g) == 2**13 - 1
    # deterministic across calls
    assert polys == find_primitive_polys(13, 4, skip=(LFSR_LARGE_0_GEN_POLY,))


def test_cross_correlation_low():
    # different primitive polys give low cross-correlation sequences
    a = 2.0 * MSequence(13, LFSR_LARGE_0_GEN_POLY, 1).generate_bits(4096).astype(float) - 1
    b = 2.0 * MSequence(13, LFSR_LARGE_1_GEN_POLY, 1).generate_bits(4096).astype(float) - 1
    corr = abs(np.dot(a, b)) / 4096
    assert corr < 0.05
