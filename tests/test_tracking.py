"""Decision-directed channel tracking under a drifting channel."""

import numpy as np
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


def _drift_capture(cfg, drift, seed=3):
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=seed,
                                 drift_rate=drift)
    return simulator.simulate_capture(cfg, spec)


@pytest.mark.slow
def test_tracking_recovers_drifting_channel():
    """A per-element phase drift that wrecks the one-shot estimator must
    decode cleanly with block tracking.  Rate calibration: the rotation
    between the preamble estimate and the first payload block must stay
    inside the decision margin (a few degrees for 16-QAM), while the
    160-frame payload accumulates ~45+ degrees per element — different
    per element, so track_phase alone cannot fix it."""
    from rub_mimo_tpu.config import Modulation

    base = dict(bit_exact=False, pid_max=160, modulation=Modulation.QAM16)
    drift = 1e-5
    cfg_off = tiny_config(**base)
    cap, tx_data, _ = _drift_capture(cfg_off, drift)
    rep_off = report.score(rx.decode(cap, cfg_off), tx_data, cfg_off)
    assert rep_off.synced
    assert max(rep_off.symbol_error_rate) > 5.0, (
        f"drift should break the static estimator: {rep_off.symbol_error_rate}"
    )

    cfg_on = tiny_config(track_channel=True, track_block_frames=8,
                         track_alpha=0.6, **base)
    rep_on = report.score(rx.decode(cap, cfg_on), tx_data, cfg_on)
    assert rep_on.synced
    assert max(rep_on.symbol_error_rate) < 2.0, rep_on.symbol_error_rate


def test_tracking_noop_on_static_channel():
    """On a static channel, tracking must not hurt."""
    base = dict(bit_exact=False, pid_max=64)
    cfg_off = tiny_config(**base)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=3)
    cap, tx_data, _ = simulator.simulate_capture(cfg_off, spec)
    rep_off = report.score(rx.decode(cap, cfg_off), tx_data, cfg_off)
    cfg_on = tiny_config(track_channel=True, track_block_frames=8, **base)
    rep_on = report.score(rx.decode(cap, cfg_on), tx_data, cfg_on)
    assert max(rep_on.symbol_error_rate) <= max(rep_off.symbol_error_rate) + 0.1


def test_tracking_validation():
    with pytest.raises(ValueError):
        tiny_config(track_channel=True, pid_max=10,
                    track_block_frames=16).validate()


@pytest.mark.slow
def test_streaming_tracking_recovers_drifting_channel():
    """track_channel in the STREAMING decoder: per-payload-block refit
    with carried state follows the same drift (block boundaries differ
    from offline, so the criterion is decode quality, not bit equality)."""
    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.pipeline import streaming

    base = dict(bit_exact=False, pid_max=160, modulation=Modulation.QAM16)
    drift = 1e-5
    cfg = tiny_config(track_channel=True, track_block_frames=8,
                      track_alpha=0.6, **base)
    cap, tx_data, _ = _drift_capture(cfg, drift)

    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    assert dec.synced
    _, rx_data = dec.result()
    n = cfg.pid_max * cfg.M_occupied
    ser = (rx_data[:, :n] != tx_data[:, :n]).mean(axis=1) * 100
    assert max(ser) < 2.0, ser


def test_streaming_tracking_static_matches_offline_decisions():
    from rub_mimo_tpu.pipeline import streaming

    cfg = tiny_config(bit_exact=False, pid_max=64, track_channel=True,
                      track_block_frames=8)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=3)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    _, rx_data = dec.result()
    agree = (rx_data == np.asarray(ref.rx_data)).mean()
    assert agree > 0.999, agree


def test_sharded_tracking_matches_offline():
    """track_channel in the SHARDED decoder: the raw frequency-domain grid
    is assembled across time shards (FFT work sharded) and the tracking
    scan runs replicated — identical scan over an identical grid, so the
    demodulated decisions must match offline exactly, and the drift must
    be recovered."""
    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod

    base = dict(bit_exact=False, pid_max=160, modulation=Modulation.QAM16)
    cfg = tiny_config(track_channel=True, track_block_frames=8,
                      track_alpha=0.6, **base)
    cap, tx_data, _ = _drift_capture(cfg, 1e-5)
    ref = rx.decode(cap, cfg)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)

    assert bool(got.synced) and bool(ref.synced)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )
    n = cfg.pid_max * cfg.M_occupied
    ser = (np.asarray(got.rx_data)[:, :n] != tx_data[:, :n]).mean(axis=1) * 100
    assert max(ser) < 2.0, ser


def test_track_channel_mode_validation():
    from rub_mimo_tpu.config import CommMode

    with pytest.raises(ValueError):
        tiny_config(track_channel=True, mode=CommMode.SISO,
                    pid_max=16).validate()
