"""Unit tests for subcarrier allocation, constellations, preambles, framing."""

import json
import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import ModemConfig, Modulation, tiny_config
from rub_mimo_tpu.ofdm import constellation, framegen, preamble, sctype


# ---------------------------------------------------------------- sctype
def test_all_carriers_allocation():
    p = sctype.init_default_sctype(64, use_all_carriers=True)
    assert (p == sctype.SCTYPE_DATA).all()
    assert sctype.validate_sctype(p) == (0, 0, 64)


def test_guard_band_allocation():
    M = 64
    p = sctype.init_default_sctype(M, use_all_carriers=False)
    n_null, n_pilot, n_data = sctype.validate_sctype(p)
    assert n_null + n_pilot + n_data == M
    # DC carrier is null, guard band around the band edge is null
    assert p[0] == sctype.SCTYPE_NULL
    G = max(M // 10, 2)
    assert (p[M // 2 - G : M // 2 + G + 1] == sctype.SCTYPE_NULL).all()
    # mirror symmetry: p[i] == p[M-i] for occupied band
    for i in range(1, M // 2 - G):
        assert p[i] == p[M - i]
    # pilots every 8th occupied position
    assert n_pilot > 0


def test_format_sctype():
    p = sctype.init_default_sctype(16, use_all_carriers=True)
    s = sctype.format_sctype(p)
    assert s == "[" + "+" * 16 + "]"


# ---------------------------------------------------------- constellation
@pytest.mark.parametrize(
    "mod",
    [Modulation.BPSK, Modulation.QPSK, Modulation.QAM16,
     Modulation.QAM64, Modulation.ARB32OPT],
)
def test_mod_demod_roundtrip(mod):
    syms = np.arange(mod.arity, dtype=np.int32)
    pts = constellation.modulate(jnp.asarray(syms), mod)
    back = constellation.demodulate(pts, mod)
    np.testing.assert_array_equal(np.asarray(back), syms)


@pytest.mark.parametrize(
    "mod", [Modulation.QPSK, Modulation.QAM16, Modulation.QAM64,
            Modulation.ARB32OPT]
)
def test_unit_average_energy(mod):
    t = constellation.table(mod)
    assert abs(np.mean(np.abs(t) ** 2) - 1.0) < 1e-6


def test_reference_qpsk_table_amplitude():
    # the reference's quirky sqrt(2)-per-axis QPSK (framing.cc:40-46)
    t = constellation.QPSK_REFERENCE_TABLE
    assert np.allclose(np.abs(t), 2.0)


def test_demod_with_noise():
    rng = np.random.default_rng(3)
    mod = Modulation.QAM16
    syms = rng.integers(0, 16, 1000).astype(np.int32)
    pts = np.asarray(constellation.modulate(jnp.asarray(syms), mod))
    noisy = pts + 0.05 * (rng.standard_normal(1000) + 1j * rng.standard_normal(1000))
    back = np.asarray(constellation.demodulate(jnp.asarray(noisy), mod))
    np.testing.assert_array_equal(back, syms)


def test_soft_llr_sign_matches_hard():
    mod = Modulation.QPSK
    syms = np.arange(4, dtype=np.int32)
    pts = constellation.modulate(jnp.asarray(syms), mod)
    llr = np.asarray(constellation.soft_demodulate_llr(pts, mod, 0.1))
    hard_bits = (syms[:, None] >> np.array([1, 0])[None, :]) & 1
    np.testing.assert_array_equal((llr < 0).astype(int), hard_bits)


# -------------------------------------------------------------- preamble
def test_s0_structure(tcfg):
    t = preamble.tables(tcfg)
    M = tcfg.M
    # even occupied subcarriers are +/-1, odd are 0
    even = np.arange(M) % 2 == 0
    assert np.all(np.abs(t.S0[even]) == 1.0)
    assert np.all(t.S0[~even] == 0.0)
    assert t.M_S0 == M // 2
    # time domain normalized: ||s0||^2 = M * (M_S0 / M_S0) -> energy M
    energy = np.sum(np.abs(t.s0) ** 2)
    # Parseval: ifft_fftw has factor M; |s0|^2 = M/M_S0 * sum|S0|^2 = M
    np.testing.assert_allclose(energy, M, rtol=1e-5)


def test_s0_halves_identical():
    # only even subcarriers occupied -> time signal has period M/2 (the
    # property Schmidl&Cox sync relies on)
    cfg = tiny_config()
    t = preamble.tables(cfg)
    M = cfg.M
    np.testing.assert_allclose(
        t.s0[: M // 2], t.s0[M // 2 :], rtol=1e-4, atol=1e-6
    )


def test_s1_structure(tcfg):
    t = preamble.tables(tcfg)
    S, C, M = t.S1.shape
    assert S == tcfg.num_streams and C == tcfg.num_access_codes
    assert np.all(np.abs(t.S1) == 1.0)  # all-carriers BPSK
    # s1 normalized by 1/sqrt(M) (framing.cc:1228): energy = M^2/M * 1 = M
    energy = np.sum(np.abs(t.s1[0, 0]) ** 2)
    np.testing.assert_allclose(energy, M, rtol=1e-5)


def test_s1_streams_differ(tcfg):
    t = preamble.tables(tcfg)
    assert not np.allclose(t.S1[0], t.S1[1])


def test_preamble_deterministic(tcfg):
    a = preamble.tables(tcfg)
    b = preamble.tables(ModemConfig(**{
        f.name: getattr(tcfg, f.name) for f in tcfg.__dataclass_fields__.values()
    }))
    np.testing.assert_array_equal(a.S0, b.S0)


# -------------------------------------------------------------- framegen
def test_sync_words_layout(tcfg):
    out = framegen.write_sync_words(tcfg)
    t = preamble.tables(tcfg)
    sym = tcfg.symbol_len
    cp = tcfg.cp_len
    S = tcfg.num_streams
    assert out.shape == (S, tcfg.sync_words_len)
    # S0 symbol on stream 0: CP then s0
    np.testing.assert_array_equal(out[0, :cp], t.s0[-cp:])
    np.testing.assert_array_equal(out[0, cp:sym], t.s0)
    # stream 1 silent during S0 symbol
    assert np.all(out[1, :sym] == 0)
    # TDMA: slot for (code=0, stream=0) is symbol 1; stream 1 silent there
    base = sym
    np.testing.assert_array_equal(out[0, base + cp : base + sym], t.s1[0, 0])
    assert np.all(out[1, base : base + sym] == 0)
    # slot (code=0, stream=1) is symbol 2; stream 0 silent
    base = 2 * sym
    np.testing.assert_array_equal(out[1, base + cp : base + sym], t.s1[1, 0])
    assert np.all(out[0, base : base + sym] == 0)


def test_assemble_payload_roundtrip(tcfg):
    """IFFT+CP then CP-strip+FFT recovers the payload (with the reference's
    1/sqrt(M_occ) TX normalization and matching RX scaling)."""
    rng = np.random.default_rng(1)
    m_occ = tcfg.M_occupied
    payload = (
        rng.standard_normal((2, 3, m_occ)) + 1j * rng.standard_normal((2, 3, m_occ))
    ).astype(np.complex64)
    x = np.asarray(framegen.assemble_payload(tcfg, jnp.asarray(payload)))
    assert x.shape == (2, 3 * tcfg.symbol_len)
    sym0 = x[:, : tcfg.symbol_len]
    # CP is a copy of the tail
    np.testing.assert_allclose(
        sym0[:, : tcfg.cp_len], sym0[:, -tcfg.cp_len :], rtol=1e-5, atol=1e-6
    )
    # FFT of the body recovers payload * (M / sqrt(M_occ)) / M ... i.e. the
    # rx convention: fft * 1/sqrt(M_occ) gives payload back (all-carriers)
    body = sym0[:, tcfg.cp_len :]
    X = np.fft.fft(body, axis=-1) / np.sqrt(m_occ)
    np.testing.assert_allclose(X, payload[:, 0], rtol=1e-4, atol=1e-5)


def test_transmit_frame_length(tcfg):
    data = framegen.generate_payload_symbols(tcfg, seed=0)
    sig = np.asarray(framegen.transmit_frame(tcfg, jnp.asarray(data)))
    expected = tcfg.sync_words_len + tcfg.pid_max * tcfg.symbol_len
    assert sig.shape == (tcfg.num_streams, expected)
    # baseband gain applied
    assert np.abs(sig).max() < 1.0


class TestArb32Opt:
    """The ARB32OPT slot (mimo/config.h:107): hex-packed optimal table by
    default, exact external tables installable for liquid parity."""

    def test_optimal_beats_cross(self):
        from rub_mimo_tpu.ofdm.constellation import (
            _cross32, optimal_constellation,
        )

        def mindist(p):
            d = np.abs(p[:, None] - p[None, :]) + np.eye(len(p)) * 9
            return d.min()

        opt = optimal_constellation(32)
        assert len(opt) == 32
        assert abs(np.mean(np.abs(opt) ** 2) - 1.0) < 1e-5
        assert mindist(opt) > 1.05 * mindist(_cross32())
        # deterministic across calls
        np.testing.assert_array_equal(opt, optimal_constellation(32))

    def test_roundtrip_default_table(self):
        from rub_mimo_tpu.ofdm import constellation as c

        syms = np.arange(32, dtype=np.int32)
        pts = c.modulate(jnp.asarray(syms), Modulation.ARB32OPT)
        back = c.demodulate(pts, Modulation.ARB32OPT)
        np.testing.assert_array_equal(np.asarray(back), syms)

    def test_external_table_install_and_restore(self, tmp_path):
        """A capture modulated with an EXTERNAL table demodulates
        correctly once the table is installed — the exact-parity path
        for liquid-recorded captures."""
        from rub_mimo_tpu.ofdm import constellation as c

        rng = np.random.default_rng(7)
        ext = rng.standard_normal(32) + 1j * rng.standard_normal(32)
        ext = (ext / np.sqrt(np.mean(np.abs(ext) ** 2))).astype(
            np.complex64
        )
        f = tmp_path / "ext.npy"
        np.save(f, ext)
        try:
            got = c.load_arb32opt_table(f)
            np.testing.assert_array_equal(got, ext)
            syms = np.arange(32, dtype=np.int32)
            pts = c.modulate(jnp.asarray(syms), Modulation.ARB32OPT)
            np.testing.assert_allclose(np.asarray(pts), ext, rtol=1e-6)
            back = c.demodulate(jnp.asarray(ext), Modulation.ARB32OPT)
            np.testing.assert_array_equal(np.asarray(back), syms)
        finally:
            c.set_arb32opt_table(None)
        # restored: default table again
        t = c.table(Modulation.ARB32OPT)
        assert not np.array_equal(t, ext)

    def test_external_table_text_and_json(self, tmp_path):
        from rub_mimo_tpu.ofdm import constellation as c

        base = np.asarray(c.table(Modulation.ARB32OPT))
        txt = tmp_path / "t.txt"
        np.savetxt(txt, np.stack([base.real, base.imag], axis=-1))
        js = tmp_path / "t.json"
        js.write_text(json.dumps(
            [[float(p.real), float(p.imag)] for p in base]
        ))
        try:
            for f in (txt, js):
                got = c.load_arb32opt_table(f)
                np.testing.assert_allclose(got, base, atol=1e-6)
        finally:
            c.set_arb32opt_table(None)

    def test_bad_table_rejected(self):
        from rub_mimo_tpu.ofdm import constellation as c

        with pytest.raises(ValueError):
            c.set_arb32opt_table(np.zeros(16, np.complex64))
