"""Sampling-frequency-offset: resamplers, estimator, two-pass correction."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import Modulation, tiny_config
from rub_mimo_tpu.estimate import sfo as sfo_mod
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import rx
from rub_mimo_tpu.utils.resample import resample_bandlimited, resample_linear


def test_bandlimited_resampler_accuracy_across_band():
    """Tones anywhere in the band (incl. near Nyquist, where linear
    interpolation fails) must resample with <1% amplitude error."""
    T = 8192
    t = np.arange(T)
    f = 1.0 + 100e-6
    for nu in (82 / T, 2458 / T, 4013 / T):  # exact bins: no leakage
        x = np.exp(2j * np.pi * nu * t).astype(np.complex64)[None, :]
        y = np.asarray(resample_bandlimited(jnp.asarray(x), f))
        want = np.exp(2j * np.pi * nu * t * f)
        err = np.abs(y[0, 100:-100] - want[100:-100]).max()
        assert err < 0.01, (nu, err)


def test_linear_resampler_low_frequency_tone():
    """Linear interpolation is honest well below Nyquist (its use case:
    position bookkeeping, not full-band OFDM)."""
    T = 4096
    t = np.arange(T)
    nu = 8 / T
    x = np.exp(2j * np.pi * nu * t).astype(np.complex64)[None, :]
    f = 1.0 + 50e-6
    y = np.asarray(resample_linear(jnp.asarray(x), f))
    want = np.exp(2j * np.pi * nu * t * f)
    assert np.abs(y[0, :-8] - want[:-8]).max() < 1e-3


def test_estimator_recovers_injected_sfo():
    """Decision-directed fit with ground-truth decisions: the estimate
    must land within 10% of the injected offset."""
    cfg = tiny_config(bit_exact=False, pid_max=64,
                      modulation=Modulation.QAM16, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=3,
                                 sfo_ppm=100.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r = rx.decode(cap, cfg)
    assert bool(r.synced)
    d = sfo_mod.estimate_sfo(r.rx_sig, cfg,
                             decisions=jnp.asarray(tx_data))
    assert abs(float(d) * 1e6 - 100.0) < 10.0, float(d) * 1e6


@pytest.mark.slow
@pytest.mark.parametrize("ppm", [30.0, 100.0, -200.0])
def test_decode_with_sfo_recovers(ppm):
    """Tracked-decision estimate + band-limited resample: captures that
    are badly broken under the static estimator decode to <1% SER."""
    cfg = tiny_config(bit_exact=False, pid_max=64,
                      modulation=Modulation.QAM16, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=3,
                                 sfo_ppm=ppm)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    n = cfg.pid_max * cfg.M_occupied

    r0 = rx.decode(cap, cfg)
    ser0 = (np.asarray(r0.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser0 > 0.03, f"SFO should break the static decode: {ser0}"

    r2, dtot, _ = sfo_mod.decode_with_sfo(cap, cfg, iters=3)
    ser2 = (np.asarray(r2.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser2 < 0.01, (ser0, ser2)
    assert abs(float(dtot) * 1e6 - ppm) < 0.15 * abs(ppm) + 5.0


@pytest.mark.slow
def test_sfo_noop_on_clean_capture():
    """decode_with_sfo on an offset-free capture must not hurt."""
    cfg = tiny_config(bit_exact=False, pid_max=64,
                      modulation=Modulation.QAM16, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=3)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    n = cfg.pid_max * cfg.M_occupied
    r, dtot, _ = sfo_mod.decode_with_sfo(cap, cfg)
    ser = (np.asarray(r.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser < 0.005, ser
    assert abs(float(dtot) * 1e6) < 5.0


def test_bandlimited_resampler_odd_length():
    """Odd-length inputs must split the spectrum at the correct bin (the
    top positive frequency must NOT alias to a negative one)."""
    T = 4097
    t = np.arange(T)
    f = 1.0 + 100e-6
    for b in (5, T // 2):  # low bin and the top positive bin
        nu = b / T
        x = np.exp(2j * np.pi * nu * t).astype(np.complex64)[None, :]
        y = np.asarray(resample_bandlimited(jnp.asarray(x), f))
        want = np.exp(2j * np.pi * nu * t * f)
        err = np.abs(y[0, 100:-100] - want[100:-100]).max()
        assert err < 0.01, (b, err)


@pytest.mark.slow
@pytest.mark.parametrize("det", ["ml", "sic"])
def test_decode_with_sfo_nonlinear_detectors(det):
    """decode_with_sfo must run its helper decodes with a ZF-family
    config even when the final detector is ML/SIC (hard remodulated
    rx_sig or untracked decisions would break the ramp fit)."""
    from rub_mimo_tpu.config import Detector

    cfg = tiny_config(bit_exact=False, pid_max=64,
                      modulation=Modulation.QAM16, sync_fallback=True,
                      detector=Detector(det))
    spec = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=3,
                                 sfo_ppm=100.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    n = cfg.pid_max * cfg.M_occupied
    r2, dtot, _ = sfo_mod.decode_with_sfo(cap, cfg, iters=3)
    ser = (np.asarray(r2.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert abs(float(dtot) * 1e6 - 100.0) < 20.0, float(dtot) * 1e6
    assert ser < 0.01, ser


def test_preamble_sfo_data_aided_tiny():
    """The data-aided access-code estimator must recover the offset with
    no payload decisions at all (tiny geometry, fast)."""
    from rub_mimo_tpu.pipeline import rx as rx_mod

    cfg = tiny_config(bit_exact=False, pid_max=16,
                      modulation=Modulation.QAM16, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=3,
                                 sfo_ppm=120.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r = rx.decode(jnp.asarray(cap), cfg)
    assert bool(r.synced)
    region = rx_mod._extract_region(jnp.asarray(cap), r.sync_index, cfg)
    d = sfo_mod.preamble_sfo(region, r.ac_index, cfg)
    assert abs(float(d) * 1e6 - 120.0) < 25.0, float(d) * 1e6


@pytest.mark.slow
@pytest.mark.parametrize("ppm", [20.0, 100.0])
def test_decode_with_sfo_full_geometry(ppm):
    """Round-5 regression: at M=2048 the ramp across the 41-symbol
    preamble breaks the LS estimate itself (frame-0 SER > 10%), so the
    decision-directed flow alone never converged — the data-aided
    preamble acquisition stage must pull it in.  Full geometry, reduced
    frames."""
    from rub_mimo_tpu.config import ModemConfig

    cfg = ModemConfig(pid_max=64, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42,
                                 sfo_ppm=ppm)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r, dtot, _ = sfo_mod.decode_with_sfo(jnp.asarray(cap), cfg, iters=2)
    n = cfg.pid_max * cfg.M_occupied
    ser = (np.asarray(r.rx_data)[:, :n] != np.asarray(tx_data)[:, :n]).mean()
    assert abs(float(dtot) * 1e6 - ppm) < 0.1 * ppm + 2.0
    assert ser < 0.005, ser
