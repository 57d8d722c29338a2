"""Delay-domain channel-estimate denoising (estimate/smooth.py)."""

import numpy as np
import pytest

from rub_mimo_tpu.config import Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import rx


def test_smoothing_is_exact_for_cp_causal_channel():
    """At very high SNR the estimate already IS CP-causal, so truncation
    must not move it (zero bias)."""
    import jax.numpy as jnp

    from rub_mimo_tpu.estimate import smooth

    cfg = tiny_config(bit_exact=False, pid_max=8, smooth_channel=True)
    spec = simulator.ChannelSpec(snr_db=60.0, delay=333, seed=7,
                                 flat=False, num_taps=4)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    r = rx.decode(cap, tiny_config(bit_exact=False, pid_max=8))
    G = np.asarray(r.G)
    Gs = np.asarray(smooth.smooth_channel_estimate(jnp.asarray(G), cfg))
    rel = np.abs(Gs - G).max() / np.abs(G).max()
    assert rel < 0.02, rel


@pytest.mark.slow
def test_smoothing_halves_ser_with_short_preamble():
    """One access code = noisy LS estimate: truncation buys ~5 dB of
    estimation SNR at tiny dims and roughly halves the SER."""
    sers = {}
    for sm in (False, True):
        cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True,
                          num_access_codes=1, modulation=Modulation.QAM16,
                          smooth_channel=sm)
        spec = simulator.ChannelSpec(snr_db=18.0, delay=333, seed=7,
                                     flat=False, num_taps=3)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        r = rx.decode(cap, cfg)
        n = cfg.pid_max * cfg.M_occupied
        sers[sm] = (np.asarray(r.rx_data)[:, :n] != tx_data[:, :n]).mean()
    assert sers[True] < 0.7 * sers[False], sers


def test_smoothing_consistent_across_pipelines():
    from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
    from rub_mimo_tpu.pipeline import streaming

    cfg = tiny_config(bit_exact=False, pid_max=16, smooth_channel=True,
                      modulation=Modulation.QAM16)
    spec = simulator.ChannelSpec(snr_db=25.0, delay=333, seed=4)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    got = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )

    sdec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    sdec.finalize()
    _, rx_data = sdec.result()
    assert (rx_data == np.asarray(ref.rx_data)).mean() > 0.999


def test_smoothing_validation():
    with pytest.raises(ValueError):
        tiny_config(smooth_channel=True,
                    use_all_carriers=False).validate()
