"""Blind RX front-end compensation (estimate/frontend.py)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rub_mimo_tpu.config import Modulation, tiny_config
from rub_mimo_tpu.estimate import frontend
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import rx


def _true_w(amp_db, phase_deg):
    g = 10.0 ** (amp_db / 20.0)
    phi = np.deg2rad(phase_deg)
    mu = (1.0 + g * np.exp(1j * phi)) / 2.0
    nu = (1.0 - g * np.exp(-1j * phi)) / 2.0
    return nu / np.conj(mu)


def test_blind_estimate_exact_on_circular_data():
    """On ideally circular data the closed form w = nu/conj(mu) is exact
    (the sqrt denominator identity) — estimate within finite-sample
    noise."""
    rng = np.random.default_rng(0)
    x = ((rng.normal(size=(1, 200000)) + 1j * rng.normal(size=(1, 200000)))
         / np.sqrt(2)).astype(np.complex64)
    w_true = _true_w(1.0, 5.0)
    g = 10.0 ** (1.0 / 20.0)
    phi = np.deg2rad(5.0)
    mu = (1 + g * np.exp(1j * phi)) / 2
    nu = (1 - g * np.exp(-1j * phi)) / 2
    z = (mu * x + nu * np.conj(x) + (0.02 - 0.01j)).astype(np.complex64)
    dc, w = frontend.estimate_frontend(jnp.asarray(z))
    assert abs(complex(np.asarray(dc)[0]) - (0.02 - 0.01j)) < 2e-3
    assert abs(complex(np.asarray(w)[0]) - w_true) < 5e-3


@pytest.mark.slow
def test_compensation_rescues_imbalanced_capture():
    """1 dB / 5 deg imbalance + DC folds the spectral image onto every
    subcarrier and destroys 64-QAM; blind compensation restores it."""
    cfg = tiny_config(bit_exact=False, pid_max=32,
                      modulation=Modulation.QAM64, sync_fallback=True)
    n = cfg.pid_max * cfg.M_occupied
    spec = simulator.ChannelSpec(
        snr_db=35.0, delay=333, seed=5,
        iq_amp_db=1.0, iq_phase_deg=5.0, dc_offset=0.05 + 0.03j,
    )
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)

    r0 = rx.decode(cap, cfg)
    ser0 = (np.asarray(r0.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser0 > 0.5, ser0

    r1, dc, w = frontend.decode_with_frontend(cap, cfg)
    assert bool(r1.synced)
    ser1 = (np.asarray(r1.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser1 < 0.02, (ser0, ser1)
    assert abs(complex(np.asarray(w)[0]) - _true_w(1.0, 5.0)) < 0.04


def test_compensation_noop_on_clean_capture():
    cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True)
    n = cfg.pid_max * cfg.M_occupied
    spec = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=5)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r, dc, w = frontend.decode_with_frontend(cap, cfg)
    ser = (np.asarray(r.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert ser < 0.005, ser
    assert abs(complex(np.asarray(w)[0])) < 0.05


@pytest.mark.slow
def test_streaming_frontend_compensation():
    """StreamingDecoder(frontend_comp=True): warmup chunks are buffered,
    the moments estimated, and the buffer replayed compensated — an
    imbalanced stream decodes where the raw stream is destroyed."""
    from rub_mimo_tpu.pipeline import streaming

    cfg = tiny_config(bit_exact=False, pid_max=32,
                      modulation=Modulation.QAM64, sync_fallback=True)
    spec = simulator.ChannelSpec(
        snr_db=35.0, delay=333, seed=5,
        iq_amp_db=1.0, iq_phase_deg=5.0, dc_offset=0.05 + 0.03j,
    )
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    capn = np.asarray(cap)
    n = cfg.pid_max * cfg.M_occupied
    T = capn.shape[-1]

    sers = {}
    for fe in (False, True):
        dec = streaming.StreamingDecoder(cfg, chunk_size=512,
                                         frontend_comp=fe)
        for i in range(0, T, 512):
            c = np.zeros((cfg.num_streams, 512), np.complex64)
            c[:, : min(512, T - i)] = capn[:, i : i + 512]
            dec.push(c)
        dec.finalize()
        assert dec.synced
        _, rx_data = dec.result()
        sers[fe] = (rx_data[:, :n] != tx_data[:, :n]).mean()
    assert sers[False] > 0.5, sers
    assert sers[True] < 0.02, sers
