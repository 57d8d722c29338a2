"""Ordered MMSE-SIC (V-BLAST) detection (detect/sic.py)."""

import numpy as np
import pytest

from rub_mimo_tpu.config import Detector, Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


def _setup_4x4():
    base = dict(bit_exact=False, num_streams=4, modulation=Modulation.QAM64,
                pid_max=16, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=300, seed=8,
                                 diagonal_dominance=1.5)
    cap, tx_data, _ = simulator.simulate_capture(tiny_config(**base), spec)
    return base, cap, tx_data


@pytest.mark.slow
def test_sic_beats_zf_on_4x4_qam64():
    """The regime ML cannot reach (64^4 combos): ordered cancellation
    must decode clean where ZF leaks symbol errors."""
    base, cap, tx_data = _setup_4x4()
    sers = {}
    for det in (Detector.ZF, Detector.SIC):
        cfg = tiny_config(detector=det, mmse_noise_var=1e-3, **base)
        rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
        assert rep.synced
        sers[det] = max(rep.symbol_error_rate)
    assert sers[Detector.ZF] > 0.5, sers
    assert sers[Detector.SIC] < 0.1, sers


def test_sic_consistent_across_pipelines():
    from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
    from rub_mimo_tpu.pipeline import streaming

    cfg = tiny_config(bit_exact=False, detector=Detector.SIC,
                      mmse_noise_var=1e-3, modulation=Modulation.QAM16,
                      pid_max=16)
    spec = simulator.ChannelSpec(snr_db=25.0, delay=333, seed=4)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )

    sdec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    sdec.finalize()
    _, rx_data = sdec.result()
    agree = (rx_data == np.asarray(ref.rx_data)).mean()
    assert agree > 0.999, agree


def test_sic_validation():
    from rub_mimo_tpu.config import CommMode

    with pytest.raises(ValueError):
        tiny_config(detector=Detector.SIC, mode=CommMode.SISO).validate()
    with pytest.raises(ValueError):
        tiny_config(detector=Detector.SIC, track_channel=True,
                    pid_max=16).validate()


def test_sic_soft_outputs_feed_fec():
    """SIC emits unbiased soft estimates, so the coded payload decodes
    through fec.decode_payload on a 4x4 64-QAM link where ZF's noise
    blow-up breaks the code."""
    from rub_mimo_tpu.ofdm import fec

    base, cap0, _ = _setup_4x4()
    cfg = tiny_config(detector=Detector.SIC, mmse_noise_var=1e-3, **base)
    msg, txd = fec.encode_payload(cfg, seed=21)
    spec = simulator.ChannelSpec(snr_db=22.0, delay=300, seed=8,
                                 diagonal_dominance=1.5)
    cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    r = rx.decode(cap, cfg)
    assert bool(r.synced)
    ber_sic = (np.asarray(fec.decode_payload(r.rx_sig, cfg)) != msg).mean()

    cfg_zf = tiny_config(detector=Detector.ZF, **base)
    r2 = rx.decode(cap, cfg_zf)
    ber_zf = (np.asarray(fec.decode_payload(r2.rx_sig, cfg_zf))
              != msg).mean()
    assert ber_sic < 1e-3, (ber_sic, ber_zf)
    assert ber_zf > 10 * max(ber_sic, 1e-4), (ber_sic, ber_zf)
