"""Tests for RX diversity (MRC) and closed-loop TX precoding."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, Detector, tiny_config
from rub_mimo_tpu.detect import precode
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.ofdm import framegen, sctype
from rub_mimo_tpu.pipeline import report, rx


def test_rx_diversity_mode():
    """MODE_RX_DIVERSITY (Interface/types.h:23): one TX stream, MRC over
    both RX antennas."""
    cfg = tiny_config(mode=CommMode.RX_DIVERSITY, siso_tx=1, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=20.0, delay=333, seed=12,
                                 diagonal_dominance=1.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert rep.symbol_error_rate[0] < 2.0


def test_rx_diversity_beats_siso_at_low_snr():
    """MRC over two antennas must not do worse than the single-antenna
    path on the same capture."""
    base = dict(siso_tx=1, bit_exact=False, plateau_threshold=0.5)
    spec = simulator.ChannelSpec(snr_db=11.0, delay=333, seed=12,
                                 diagonal_dominance=1.0)
    sers = {}
    for mode in (CommMode.RX_DIVERSITY, CommMode.SISO):
        cfg = tiny_config(mode=mode, siso_rx=1, **base)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        result = rx.decode(cap, cfg)
        rep = report.score(result, tx_data, cfg)
        assert rep.synced
        sers[mode] = rep.symbol_error_rate[0]
    assert sers[CommMode.RX_DIVERSITY] <= sers[CommMode.SISO] + 0.5


def test_precoder_normalization():
    rng = np.random.default_rng(0)
    G = (rng.standard_normal((16, 2, 2)) + 1j * rng.standard_normal((16, 2, 2))
         ).astype(np.complex64)
    for P in (precode.zf_precoder(jnp.asarray(G)),
              precode.mmse_precoder(jnp.asarray(G), 1e-2)):
        P = np.asarray(P)
        fro2 = np.sum(np.abs(P) ** 2, axis=(-2, -1))
        np.testing.assert_allclose(fro2, 2.0, rtol=1e-4)


def test_closed_loop_precoding_e2e():
    """The working version of the reference's dead TX_BEAMFORMING path
    (main.cc:381-790): estimate Ghat from a first exchange, ZF-precode the
    second transmission, and verify the receiver sees ~identity effective
    channel and decodes cleanly with its ordinary pipeline."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=280, seed=31)

    # round 1: plain exchange -> Ghat
    cap1, _, h = simulator.simulate_capture(cfg, spec)
    r1 = rx.decode(cap1, cfg)
    rep1_sync = bool(r1.synced)
    assert rep1_sync
    occ = sctype.occupied_indices(cfg.subcarrier_allocation())
    G_occ = jnp.asarray(np.asarray(r1.G))[jnp.asarray(occ)]

    # round 2: precoded transmission through the SAME channel
    P = precode.zf_precoder(G_occ)
    tx_data = framegen.generate_payload_symbols(cfg, seed=9)
    tx = framegen.transmit_frame(cfg, jnp.asarray(tx_data), precoder=P)
    cap2 = simulator.apply_channel(tx, h, spec, cfg)
    r2 = rx.decode(cap2, cfg)
    rep2 = report.score(r2, tx_data, cfg)
    assert rep2.synced
    assert max(rep2.symbol_error_rate) < 1.0

    # the effective channel the receiver estimated is ~diagonal
    G2 = np.asarray(r2.G)[occ]
    diag = np.abs(G2[:, [0, 1], [0, 1]]).mean()
    off = np.abs(G2[:, [0, 1], [1, 0]]).mean()
    assert off < 0.25 * diag, f"effective channel not diagonalized: {off} vs {diag}"


def test_alamouti_e2e():
    """Alamouti 2x2 STBC: single data stream space-time coded over both
    antennas, combined with full diversity at the receiver."""
    cfg = tiny_config(mode=CommMode.ALAMOUTI, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=9)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert rep.symbol_error_rate[0] < 1.0


def test_alamouti_combiner_algebra():
    """Noiseless algebra: encode -> flat channel -> combine recovers the
    symbols exactly."""
    import jax.numpy as jnp

    from rub_mimo_tpu.detect import alamouti

    rng = np.random.default_rng(0)
    n_sym, n_sc, n_rx = 8, 16, 2
    s = (rng.standard_normal((n_sym, n_sc))
         + 1j * rng.standard_normal((n_sym, n_sc))).astype(np.complex64)
    h = (rng.standard_normal((n_sc, n_rx, 2))
         + 1j * rng.standard_normal((n_sc, n_rx, 2))).astype(np.complex64)
    ant = np.asarray(alamouti.encode_pairs(jnp.asarray(s)))  # [2, n_sym, sc]
    # rx: y[t, rx, sc] = sum_a h[sc, rx, a] * ant[a, t, sc]
    y = np.einsum("sra,ats->trs", h, ant)
    out = np.asarray(alamouti.combine_pairs(jnp.asarray(y), jnp.asarray(h)))
    np.testing.assert_allclose(out, s, rtol=1e-4, atol=1e-4)


def test_alamouti_diversity_gain():
    """STBC must beat single-antenna SISO on the same channel draw at low
    SNR (that's the point of transmit diversity)."""
    spec = simulator.ChannelSpec(snr_db=10.0, delay=333, seed=40,
                                 diagonal_dominance=1.0)
    sers = {}
    for mode in (CommMode.ALAMOUTI, CommMode.SISO):
        cfg = tiny_config(mode=mode, siso_tx=0, siso_rx=0, bit_exact=False,
                          plateau_threshold=0.5)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
        assert rep.synced, mode
        sers[mode] = rep.symbol_error_rate[0]
    assert sers[CommMode.ALAMOUTI] <= sers[CommMode.SISO] + 0.2


def test_alamouti_config_validation():
    with pytest.raises(ValueError):
        tiny_config(mode=CommMode.ALAMOUTI, pid_max=7).validate()
    with pytest.raises(ValueError):
        tiny_config(mode=CommMode.ALAMOUTI, num_streams=4).validate()


def test_alamouti_rejects_precoder():
    import jax.numpy as jnp

    from rub_mimo_tpu.detect import precode
    from rub_mimo_tpu.ofdm import framegen

    cfg = tiny_config(mode=CommMode.ALAMOUTI, bit_exact=False)
    data = framegen.generate_payload_symbols(cfg, seed=0)
    P = jnp.tile(jnp.eye(2, dtype=jnp.complex64), (cfg.M_occupied, 1, 1))
    with pytest.raises(ValueError):
        framegen.transmit_frame(cfg, jnp.asarray(data), precoder=P)


def test_s1_qpsk_variant_e2e():
    """MAKE_S1_QPSK (framing.cc:1160-1212, compiled out in the reference)
    as a runtime option: QPSK access codes with the variant's verbatim
    quirks (the `& 0x11` mask, the 1/sqrt(M_occupied) normalization) —
    the full chain syncs, estimates, and decodes cleanly with them."""
    from rub_mimo_tpu.ofdm import preamble
    from rub_mimo_tpu.ofdm.constellation import QPSK_REFERENCE_TABLE

    cfg = tiny_config(bit_exact=False, s1_qpsk=True)
    t = preamble.tables(cfg)
    vals = np.unique(np.round(np.asarray(t.S1)[np.asarray(t.S1) != 0], 5))
    # the & 0x11 quirk: only table entries 0 and 1 ever appear
    allowed = np.unique(np.round(QPSK_REFERENCE_TABLE[:2], 5))
    assert set(vals.tolist()) <= set(allowed.tolist()), vals

    spec = simulator.ChannelSpec(snr_db=35.0, delay=300, seed=6)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) == 0.0, rep.symbol_error_rate
    # and the table really differs from the BPSK variant
    t_bpsk = preamble.tables(tiny_config(bit_exact=False))
    assert not np.array_equal(np.asarray(t.S1), np.asarray(t_bpsk.S1))


def test_same_signal_on_all_tx_e2e():
    """SAME_SIGNAL_ON_ALL_TX (main.cc:1223-1233, compiled out): every
    antenna transmits stream 0's payload; the 2x2 ZF chain still
    separates the (identical) streams and decodes both error-free."""
    from rub_mimo_tpu.ofdm import framegen as fg

    cfg = tiny_config(bit_exact=False, same_signal_on_all_tx=True)
    data = fg.generate_payload_symbols(cfg, seed=3)
    np.testing.assert_array_equal(data[0], data[1])

    spec = simulator.ChannelSpec(snr_db=35.0, delay=400, seed=8)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    np.testing.assert_array_equal(tx_data[0], tx_data[1])
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) == 0.0, rep.symbol_error_rate
