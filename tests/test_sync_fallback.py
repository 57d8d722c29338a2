"""Low-SNR S0-xcorr sync fallback and phase tracking tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx
from rub_mimo_tpu.sync import schmidl_cox, xcorr_sync


def test_xcorr_finds_s0():
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=400, seed=3)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    res = xcorr_sync.s0_xcorr_sync(cap, cfg)
    # S0 body starts at delay + cp_len
    assert abs(int(res.peak_index) - (400 + cfg.cp_len)) <= 1
    assert float(res.quality) > 0.7


def test_fallback_acquires_below_plateau_limit():
    """At 10 dB SNR the 0.95 plateau cannot fire; the fallback must
    acquire and the decode must work."""
    cfg_fb = tiny_config(bit_exact=False, sync_fallback=True)
    cfg_raw = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=10.0, delay=350, seed=13)
    cap, tx_data, _ = simulator.simulate_capture(cfg_fb, spec)

    plain = schmidl_cox.synchronize(cap, cfg_raw)
    assert not bool(plain.synced)  # the reference would hang here

    r = rx.decode(cap, cfg_fb)
    rep = report.score(r, tx_data, cfg_fb)
    assert rep.synced
    # QPSK at 10 dB with estimation noise: just require meaningful decode
    assert max(rep.symbol_error_rate) < 20.0


def test_fallback_does_not_override_plateau():
    """When the plateau fires, its sync_index wins (reference behaviour
    preserved)."""
    cfg_fb = tiny_config(bit_exact=False, sync_fallback=True)
    cfg_raw = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
    cap, _, _ = simulator.simulate_capture(cfg_fb, spec)
    r_fb = rx.decode(cap, cfg_fb)
    r_raw = rx.decode(cap, cfg_raw)
    assert int(r_fb.sync_index) == int(r_raw.sync_index)
    np.testing.assert_array_equal(
        np.asarray(r_fb.rx_data), np.asarray(r_raw.rx_data)
    )


def test_fallback_rejects_noise():
    cfg = tiny_config(sync_fallback=True)
    rng = np.random.default_rng(0)
    T = cfg.window_len
    noise = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))
             ).astype(np.complex64) * 0.01
    r = rx.decode(jnp.asarray(noise), cfg)
    assert not bool(r.synced)


def test_phase_tracking_fixes_residual_ramp():
    """An uncorrected small CFO leaves a phase ramp across the payload;
    decision-directed tracking must repair late frames."""
    base = dict(bit_exact=False, pid_max=16)
    eps = 0.004
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=eps)
    cfg_off = tiny_config(**base)
    cap, tx_data, _ = simulator.simulate_capture(cfg_off, spec)
    rep_off = report.score(rx.decode(cap, cfg_off), tx_data, cfg_off)
    cfg_on = tiny_config(track_phase=True, **base)
    rep_on = report.score(rx.decode(cap, cfg_on), tx_data, cfg_on)
    assert rep_on.synced and rep_off.synced
    assert max(rep_on.symbol_error_rate) <= max(rep_off.symbol_error_rate)
    assert max(rep_on.symbol_error_rate) < 2.0


def test_fallback_rescues_4x4_weak_coupling():
    """With 4 rx streams the all-streams plateau is gated by the weakest
    rx<-tx0 link (S0 transmits on antenna 0 only); a draw with one ~0.08
    coupling kills plain acquisition and the S0 fallback must rescue it
    (observed at full scale: seed-7 4x4 fails plain, decodes 0% SER with
    fallback)."""
    from rub_mimo_tpu.config import Detector, Modulation

    base = dict(num_streams=4, num_access_codes=3, pid_max=4,
                modulation=Modulation.QAM16, detector=Detector.MMSE,
                mmse_noise_var=1e-3, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=210, seed=0,
                                 diagonal_dominance=3.0)
    h = simulator.draw_channel(spec, 4, 4)
    h[3, 0, 0] = 0.02 + 0.01j  # cripple the rx3<-tx0 link

    from rub_mimo_tpu.ofdm import framegen
    cfg = tiny_config(**base)
    tx_data = framegen.generate_payload_symbols(cfg, seed=0)
    tx = framegen.transmit_frame(cfg, jnp.asarray(tx_data))
    cap = simulator.apply_channel(tx, h, spec, cfg)

    plain = rx.decode(cap, tiny_config(**base))
    assert not bool(plain.synced)

    r = rx.decode(cap, tiny_config(sync_fallback=True, **base))
    rep = report.score(r, tx_data, tiny_config(sync_fallback=True, **base))
    assert rep.synced
    assert max(rep.symbol_error_rate) < 2.0


def test_fallback_with_cfo_correction():
    """Fallback sync + CFO: the coarse estimate must come from the S0
    halves (the plateau correlation never fired), then residual refines —
    a low-SNR, CFO-impaired capture decodes."""
    cfg = tiny_config(bit_exact=False, sync_fallback=True, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=12.0, delay=350, seed=13,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)

    plain = schmidl_cox.synchronize(cap, cfg)
    assert not bool(plain.synced)  # plateau can't fire here

    r = rx.decode(cap, cfg)
    rep = report.score(r, tx_data, cfg)
    assert rep.synced
    assert abs(rep.cfo_hat - 0.11) < 0.03
    assert max(rep.symbol_error_rate) < 20.0


def test_fallback_ignores_silent_padding():
    """Zero padding (or any silent span) must not outscore the real S0
    peak: the normalized score's denominator floor caps silent-window
    residue (round-4 regression via shard_capture's n_time*128 pad)."""
    import numpy as np

    from rub_mimo_tpu.sync.xcorr_sync import s0_xcorr_sync

    cfg = tiny_config(bit_exact=False, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=10.0, delay=350, seed=13)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    capn = np.asarray(cap)
    r0 = s0_xcorr_sync(jnp.asarray(capn), cfg)
    padded = np.pad(capn, ((0, 0), (0, 700)))
    r1 = s0_xcorr_sync(jnp.asarray(padded), cfg)
    assert int(r1.peak_index) == int(r0.peak_index)
    assert abs(float(r1.quality) - float(r0.quality)) < 1e-3
