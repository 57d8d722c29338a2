"""Unit tests for the detectors: invert vs linalg, MMSE, modes, config."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, tiny_config
from rub_mimo_tpu.detect import mmse as mmse_mod
from rub_mimo_tpu.detect import precode, zf


def _rand_G(n, batch=64, seed=0, cond_boost=2.0):
    rng = np.random.default_rng(seed)
    G = (rng.standard_normal((batch, n, n))
         + 1j * rng.standard_normal((batch, n, n))).astype(np.complex64)
    for i in range(n):
        G[:, i, i] *= cond_boost
    return G


def test_invert_2x2_equals_linalg_inverse():
    """W * gain == G^{-1} (SURVEY §4: 2x2 invert vs jnp.linalg)."""
    G = _rand_G(2)
    W, gain = zf.invert(jnp.asarray(G))
    got = np.asarray(W) * np.asarray(gain)[:, None, None]
    want = np.linalg.inv(G)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_invert_2x2_adjugate_structure():
    """W itself is conj(det)*adj(G) (framing.cc:1352-1361)."""
    G = _rand_G(2, batch=8)
    W, gain = zf.invert(jnp.asarray(G))
    W = np.asarray(W)
    det = G[:, 0, 0] * G[:, 1, 1] - G[:, 0, 1] * G[:, 1, 0]
    np.testing.assert_allclose(
        W[:, 0, 0], np.conj(det) * G[:, 1, 1], rtol=1e-4
    )
    np.testing.assert_allclose(
        W[:, 0, 1], -np.conj(det) * G[:, 0, 1], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gain), 1.0 / np.abs(det) ** 2, rtol=1e-4
    )


def test_invert_to_unity_variant():
    """INVERT_TO_UNITY=true path (config.h:103): W == G^{-1}, gain == 1."""
    G = _rand_G(2, batch=8)
    W, gain = zf.invert(jnp.asarray(G), invert_to_unity=True)
    np.testing.assert_allclose(
        np.asarray(W), np.linalg.inv(G), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(gain), 1.0)


@pytest.mark.parametrize("n", [3, 4])
def test_invert_nxn(n):
    G = _rand_G(n, cond_boost=3.0)
    W, gain = zf.invert(jnp.asarray(G))
    got = np.asarray(W) * np.asarray(gain)[:, None, None]
    np.testing.assert_allclose(got, np.linalg.inv(G), rtol=5e-3, atol=5e-4)


def test_mmse_limits_to_zf():
    """sigma^2 -> 0: unbiased MMSE equals the ZF inverse."""
    G = _rand_G(2)
    W, _ = mmse_mod.mmse_weights(jnp.asarray(G), 1e-9)
    np.testing.assert_allclose(
        np.asarray(W), np.linalg.inv(G), rtol=5e-3, atol=1e-3
    )


def test_mmse_unbiased():
    """diag(W G) == 1 by construction."""
    G = _rand_G(2, batch=16, seed=3)
    W, _ = mmse_mod.mmse_weights(jnp.asarray(G), 0.05)
    D = np.einsum("bij,bjk->bik", np.asarray(W), G)
    np.testing.assert_allclose(
        D[:, [0, 1], [0, 1]], 1.0, rtol=1e-4, atol=1e-4
    )


def test_effective_channel_identityish():
    G = _rand_G(2, batch=16, seed=5)
    P = precode.zf_precoder(jnp.asarray(G))
    E = np.asarray(precode.effective_channel(jnp.asarray(G), P))
    off = np.abs(E[:, [0, 1], [1, 0]])
    diag = np.abs(E[:, [0, 1], [0, 1]])
    assert (off < 1e-3 * diag.max()).all()


def test_rx_beamforming_mode_is_zf():
    """MODE_RX_BEAMFORMING (types.h:24) maps to the ZF receive path —
    the reference's rx_beamforming namespace IS its ZF receiver."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    spec = simulator.ChannelSpec(snr_db=35.0, delay=222, seed=21)
    cfg_zf = tiny_config(bit_exact=False)
    cap, _, _ = simulator.simulate_capture(cfg_zf, spec)
    r1 = rx.decode(cap, cfg_zf)
    cfg_bf = cfg_zf.replace(mode=CommMode.RX_BEAMFORMING)
    r2 = rx.decode(cap, cfg_bf)
    np.testing.assert_array_equal(
        np.asarray(r1.rx_data), np.asarray(r2.rx_data)
    )


def test_config_validate():
    tiny_config().validate()
    with pytest.raises(ValueError):
        tiny_config(num_subcarriers=100).validate()  # not a power of 2
    with pytest.raises(ValueError):
        tiny_config(cp_len=0).validate()
    with pytest.raises(ValueError):
        tiny_config(siso_tx=5).validate()
    with pytest.raises(ValueError):
        tiny_config(timing_mode="bogus").validate()


def test_qam256_roundtrip_and_e2e():
    """QAM-256 (new, beyond the GUI's QAM64 ceiling) end-to-end at high SNR."""
    import jax.numpy as jnp

    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.ofdm import constellation
    from rub_mimo_tpu.pipeline import report, rx

    syms = np.arange(256, dtype=np.int32)
    pts = constellation.modulate(jnp.asarray(syms), Modulation.QAM256)
    back = constellation.demodulate(pts, Modulation.QAM256)
    np.testing.assert_array_equal(np.asarray(back), syms)

    cfg = tiny_config(modulation=Modulation.QAM256, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=45.0, delay=222, seed=21)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 2.0


@pytest.mark.slow
def test_3x3_mimo_e2e():
    """Odd stream count (3x3): generalized NxN detection + auto-extended
    polynomial set."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import report, rx

    cfg = tiny_config(num_streams=3, num_access_codes=3, pid_max=4,
                      bit_exact=False, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=40.0, delay=210, seed=6,
                                 diagonal_dominance=3.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 3.0


def test_mmse_beats_zf_on_ill_conditioned_channel():
    """MMSE's regularization must not lose to ZF when the channel is
    nearly singular (noise blow-up at small |det| subcarriers)."""
    import jax.numpy as jnp

    from rub_mimo_tpu.config import Detector
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.ofdm import framegen
    from rub_mimo_tpu.pipeline import report, rx

    spec = simulator.ChannelSpec(snr_db=18.0, delay=300, seed=2)
    h = simulator.draw_channel(spec, 2, 2)
    # make the channel nearly rank-1
    h[1, :, 0] = h[0, :, 0] * 1.05 + 0.1
    base = dict(bit_exact=False, plateau_threshold=0.5)
    cfg = tiny_config(**base)
    tx_data = framegen.generate_payload_symbols(cfg, seed=0)
    tx = framegen.transmit_frame(cfg, jnp.asarray(tx_data))
    cap = simulator.apply_channel(tx, h, spec, cfg)

    sers = {}
    for det, nv in ((Detector.ZF, 0.0), (Detector.MMSE, 3e-2)):
        c = tiny_config(detector=det, mmse_noise_var=nv or 1e-2, **base)
        rep = report.score(rx.decode(cap, c), tx_data, c)
        assert rep.synced
        sers[det] = max(rep.symbol_error_rate)
    assert sers[Detector.MMSE] <= sers[Detector.ZF] + 0.1


@pytest.mark.slow
def test_noise_var_estimate_accurate():
    """The data-aided sigma^2 estimate must match the injected AWGN level
    at the equalizer input (within estimation tolerance)."""
    import jax.numpy as jnp

    from rub_mimo_tpu.estimate import ls
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx
    from rub_mimo_tpu.sync import matched_filter, schmidl_cox

    cfg = tiny_config(bit_exact=False, num_access_codes=8,
                      plateau_threshold=0.5)
    snr_db = 20.0
    spec = simulator.ChannelSpec(snr_db=snr_db, delay=333, seed=7)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    sync = schmidl_cox.synchronize(cap, cfg)
    window = rx._extract_window(cap, sync.sync_index, cfg)
    mf = matched_filter.search(window, cfg, joint=True)
    G = ls.estimate_channel(window, mf.ac_index, cfg)
    got = float(ls.estimate_noise_var(window, mf.ac_index, G, cfg))

    # injected: noise_var_t = mean|tx|^2 * 10^(-snr/10); at the equalizer
    # input (1/sqrt(M_occ) FFT scaling) the per-subcarrier variance is
    # M * sigma_t^2 / M_occ == sigma_t^2 for all-carriers
    from rub_mimo_tpu.ofdm import framegen
    tx = framegen.transmit_frame(cfg, jnp.asarray(tx_data))
    sig_power = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    want = sig_power * 10.0 ** (-snr_db / 10.0)
    assert 0.5 * want < got < 2.5 * want, (got, want)


def test_mmse_auto_noise_e2e():
    from rub_mimo_tpu.config import Detector
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import report, rx

    cfg = tiny_config(bit_exact=False, detector=Detector.MMSE,
                      mmse_auto_noise=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=130, seed=4)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 2.0
