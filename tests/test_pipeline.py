"""End-to-end pipeline tests: TX -> channel -> decode -> score.

These are the rebuild's replacements for the reference's over-the-air
validation (SURVEY §4): synthetic captures play the role of the B210
experiments, and the pipeline's own SER report is the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, Detector, Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


def run_e2e(cfg, spec, payload_seed=0, **decode_kw):
    cap, tx_data, h = simulator.simulate_capture(cfg, spec, payload_seed=payload_seed)
    result = rx.decode(cap, cfg, **decode_kw)
    rep = report.score(result, tx_data, cfg, num_samples=cap.shape[-1])
    return result, rep, h, cap


def test_mimo_2x2_zf_clean_channel():
    """Config 3 analog (tiny): 2x2 MIMO ZF at high SNR -> ~0 SER."""
    cfg = tiny_config()
    spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
    result, rep, h, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert rep.symbol_error_rate[0] < 1.0
    assert rep.symbol_error_rate[1] < 1.0


def test_mimo_2x2_channel_estimate_accuracy():
    """Ghat must recover the flat channel on occupied carriers."""
    cfg = tiny_config().replace(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=40.0, delay=388, seed=3)
    result, rep, h, _ = run_e2e(cfg, spec)
    assert rep.synced
    G = np.asarray(result.G)  # [M, rx, tx]
    # the effective channel includes the TX BASEBAND_GAIN scaling
    # (main.cc:1048-1052): Ghat ~= baseband_gain * H
    H = np.asarray(h)[..., 0] * cfg.baseband_gain  # [rx, tx]
    err = np.abs(G - H[None, :, :]).max()
    assert err < 0.05 * cfg.baseband_gain * 10, f"channel estimate error {err}"


def test_mimo_2x2_16qam():
    """Config 3: 16-QAM payload."""
    cfg = tiny_config(modulation=Modulation.QAM16, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=222, seed=21)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0


def test_mimo_2x2_mmse():
    """Config 4: MMSE detection."""
    cfg = tiny_config(detector=Detector.MMSE, mmse_noise_var=1e-3, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=130, seed=4)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0


def test_siso_mode():
    """SISO mode (config.h:89-91): single active tx, scalar equalizer."""
    cfg = tiny_config(mode=CommMode.SISO, siso_tx=1, siso_rx=1)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=300, seed=9)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert rep.symbol_error_rate[0] < 1.0  # single (rx,tx) pair scored


@pytest.mark.slow
def test_mimo_4x4():
    """Config 5 (stretch): 4x4 MIMO with auto-extended LFSR polys."""
    cfg = tiny_config(num_streams=4, num_access_codes=3, pid_max=4, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=40.0, delay=210, seed=14,
                                 diagonal_dominance=3.0)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 2.0


def test_mimo_4x4_mmse():
    cfg = tiny_config(num_streams=4, num_access_codes=3, pid_max=4,
                      detector=Detector.MMSE, mmse_noise_var=1e-3,
                      bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=40.0, delay=210, seed=14,
                                 diagonal_dominance=3.0)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 2.0


def test_no_sync_on_noise():
    """Failure detection: pure noise must not sync (the reference would
    simply hang/decode nothing; we report synced=False)."""
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    T = cfg.window_len // 2
    noise = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))).astype(
        np.complex64
    ) * 0.01
    result = rx.decode(jnp.asarray(noise), cfg)
    assert not bool(result.synced)
    assert not bool(np.asarray(result.symbol_valid).any())


@pytest.mark.slow
def test_matched_filter_direct_vs_xcorr():
    """The FFT cross-correlation path must agree with the reference-shaped
    direct windowed search."""
    cfg = tiny_config(num_access_codes=2, pid_max=2)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=100, seed=2)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    r_fast = rx.decode(cap, cfg, mf_method="xcorr")
    r_direct = rx.decode(cap, cfg, mf_method="direct")
    np.testing.assert_array_equal(
        np.asarray(r_fast.ac_index), np.asarray(r_direct.ac_index)
    )
    np.testing.assert_array_equal(
        np.asarray(r_fast.s0_index), np.asarray(r_direct.s0_index)
    )


def test_decode_jit_compiles():
    cfg = tiny_config(pid_max=4)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=64, seed=6)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    dec = rx.make_decoder(cfg)
    r1 = dec(cap)
    r2 = dec(cap)  # cached
    np.testing.assert_array_equal(np.asarray(r1.rx_data), np.asarray(r2.rx_data))


def test_cfo_corrected_decode():
    """Config 2 analog: decode under CFO with correction enabled."""
    cfg = tiny_config(correct_cfo=True, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, cfo_subcarriers=0.08,
                                 seed=31)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 5.0


def test_selective_channel_short_taps():
    """Frequency-selective channel within the CP: per-subcarrier ZF still
    equalizes."""
    # note: delay spread eats into the S&C plateau, and the reference's
    # fire condition demands plateau width > cp_len (framing.cc:613-615) —
    # so the spread must stay well below cp_len for sync to fire at all.
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=300, flat=False,
                                 num_taps=2, seed=17, diagonal_dominance=3.0)
    _, rep, _, _ = run_e2e(cfg, spec)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 5.0
