"""Tests for moving sums, the S&C metric, plateau scan, and CFO."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.ofdm import framegen
from rub_mimo_tpu.sync import schmidl_cox
from rub_mimo_tpu.utils import movsum


# ------------------------------------------------------------ moving_sum
def _ref_moving_sum(x, w):
    out = np.zeros_like(x)
    for t in range(len(x)):
        lo = max(0, t - w + 1)
        out[t] = x[lo : t + 1].sum()
    return out


@pytest.mark.parametrize("T,w,block", [(100, 7, 16), (1000, 32, 64), (257, 8, 1 << 15)])
def test_moving_sum_matches_reference(T, w, block):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(T).astype(np.float32)
    got = np.asarray(movsum.moving_sum(jnp.asarray(x), w, block=block))
    np.testing.assert_allclose(got, _ref_moving_sum(x, w), rtol=1e-4, atol=1e-4)


def test_moving_sum_complex_batched():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((3, 200)) + 1j * rng.standard_normal((3, 200))).astype(
        np.complex64
    )
    got = np.asarray(movsum.moving_sum(jnp.asarray(x), 16, block=64))
    for i in range(3):
        np.testing.assert_allclose(
            got[i], _ref_moving_sum(x[i], 16), rtol=1e-4, atol=1e-4
        )


def test_delay():
    x = jnp.arange(10, dtype=jnp.float32)[None, :]
    d = np.asarray(movsum.delay(x, 3))
    np.testing.assert_array_equal(d[0, :3], 0)
    np.testing.assert_array_equal(d[0, 3:], np.arange(7))


# ------------------------------------------------------------- sc metric
def _serial_sc_metric(x, M):
    """Direct per-sample replication of framing.cc:626-637."""
    M2 = M // 2
    T = len(x)
    delay_line = np.zeros(M2, dtype=np.complex64)
    corr_state = np.zeros(M2, dtype=np.complex64)
    norm_state = np.zeros(M, dtype=np.float32)
    out = np.zeros(T, dtype=np.float32)
    for t in range(T):
        xd = delay_line[0]
        delay_line = np.roll(delay_line, -1)
        delay_line[-1] = x[t]
        corr_state = np.roll(corr_state, -1)
        corr_state[-1] = np.conj(xd) * x[t]
        c = -corr_state.sum()
        norm_state = np.roll(norm_state, -1)
        norm_state[-1] = np.abs(x[t]) ** 2
        e = 0.5 * norm_state.sum()
        out[t] = (c.real**2 + c.imag**2) / (e * e) if e != 0 else np.nan
    return out


def test_sc_metric_matches_serial():
    M = 16
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(np.complex64)
    metric, _ = schmidl_cox.sc_metric(jnp.asarray(x)[None, :], M, block=64)
    got = np.asarray(metric)[0]
    want = _serial_sc_metric(x, M)
    ok = ~np.isnan(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-3, atol=1e-4)


def test_sc_metric_plateau_on_preamble():
    """The S0 symbol (periodic halves) must produce a metric ~1 plateau."""
    cfg = tiny_config()
    data = framegen.generate_payload_symbols(cfg, seed=0)
    tx = framegen.transmit_frame(cfg, jnp.asarray(data))
    delay_n = 300
    x = jnp.pad(tx, ((0, 0), (delay_n, 100)))
    metric, _ = schmidl_cox.sc_metric(x, cfg.M)
    m = np.asarray(metric)
    # inside the S0 body (after the correlator fills), metric ~ 1 on stream 0
    peak_region = m[0, delay_n + cfg.cp_len + cfg.M - 4 : delay_n + cfg.cp_len + cfg.M + 4]
    assert peak_region.max() > 0.98


def test_plateau_scan_fires_and_sync_index():
    # synthetic metric: both streams cross threshold for > cp_len samples
    T, cp = 500, 16
    m = np.zeros((2, T), dtype=np.float32)
    m[0, 100:140] = 1.0
    m[1, 102:142] = 1.0
    synced, t_star, starts, mask = schmidl_cox.plateau_scan(jnp.asarray(m), cp, 0.95)
    assert bool(synced)
    # stream 0 run starts at 100 and needs t-100 > 16 -> t >= 117; stream 1
    # needs t >= 119 -> first joint fire at 119
    assert int(t_star) == 119
    np.testing.assert_array_equal(np.asarray(starts), [100, 102])


def test_plateau_scan_no_fire():
    m = np.zeros((2, 300), dtype=np.float32)
    m[0, 50:100] = 1.0  # only one stream
    synced, _, _, _ = schmidl_cox.plateau_scan(jnp.asarray(m), 16, 0.95)
    assert not bool(synced)


def test_nan_metric_is_not_plateau():
    m = np.full((1, 100), np.nan, dtype=np.float32)
    synced, _, _, _ = schmidl_cox.plateau_scan(jnp.asarray(m), 4, 0.95)
    assert not bool(synced)


# ------------------------------------------------------------------ sync
def test_synchronize_on_simulated_capture():
    cfg = tiny_config()
    spec = simulator.ChannelSpec(snr_db=30.0, delay=777, seed=5)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    res = schmidl_cox.synchronize(cap, cfg)
    assert bool(res.synced)
    # sync fires inside the S0 symbol region: plateau should start within
    # about [delay, delay + symbol_len]
    si = int(res.sync_index)
    assert 777 - cfg.M2 <= si <= 777 + cfg.symbol_len


def test_cfo_estimate():
    cfg = tiny_config()
    eps = 0.12  # subcarrier units
    # note: a mixing channel is required — S0 transmits on stream 0 only
    # (framing.cc:182-190), so with an identity channel rx stream 1 hears
    # pure noise and the all-streams plateau condition can never fire.
    spec = simulator.ChannelSpec(
        snr_db=35.0, delay=400, cfo_subcarriers=eps, seed=7
    )
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    res = schmidl_cox.synchronize(cap, cfg)
    assert bool(res.synced)
    assert abs(float(res.cfo_hat) - eps) < 0.03


def test_correct_cfo_roundtrip():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 500)) + 1j * rng.standard_normal((2, 500))).astype(
        np.complex64
    )
    eps = 0.2
    n = np.arange(500)
    rot = np.exp(2j * np.pi * eps * n / cfg.M).astype(np.complex64)
    y = schmidl_cox.correct_cfo(jnp.asarray(x * rot), jnp.float32(eps), cfg.M)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-4)


# --------------------------------------------------- quorum plateau rule
def test_plateau_scan_quorum_fires_on_subset():
    """Robust mode (cfg.sync_quorum): >= q streams each holding a run
    > cp_len fire the detector; sync_index averages the PARTICIPANTS'
    run starts only."""
    T, cp = 500, 16
    m = np.zeros((4, T), dtype=np.float32)
    m[0, 100:140] = 1.0
    m[1, 102:142] = 1.0
    m[2, 104:144] = 1.0
    # stream 3 never crosses threshold (a faded rx<-tx0 link)
    synced_all, _, _, _ = schmidl_cox.plateau_scan(
        jnp.asarray(m), cp, 0.95)
    assert not bool(synced_all)
    synced, t_star, starts, mask = schmidl_cox.plateau_scan(
        jnp.asarray(m), cp, 0.95, quorum=3)
    assert bool(synced)
    # stream 2's run starts at 104 and needs t - 104 > 16 -> t >= 121
    assert int(t_star) == 121
    np.testing.assert_array_equal(np.asarray(mask),
                                  [True, True, True, False])
    si = schmidl_cox.sync_index_from(jnp.asarray(starts),
                                     jnp.asarray(mask))
    assert int(si) == (100 + 102 + 104) // 3


def test_plateau_scan_quorum_not_rotating_participants():
    """q streams above at every position but with ROTATING membership
    must NOT fire: each participant needs its own run > cp_len."""
    T, cp = 400, 16
    m = np.zeros((3, T), dtype=np.float32)
    # alternate 8-sample bursts: always exactly 2 streams above, but no
    # stream ever holds a run longer than 8
    for t0 in range(100, 200, 8):
        pair = (t0 // 8) % 3
        for s in range(3):
            if s != pair:
                m[s, t0:t0 + 8] = 1.0
    synced, _, _, _ = schmidl_cox.plateau_scan(
        jnp.asarray(m), cp, 0.95, quorum=2)
    assert not bool(synced)


def test_quorum_acquires_4x4_with_one_jammed_stream():
    """End-to-end tiny 4x4: one rx stream drowned in noise (its S&C
    metric plateaus below 0.95).  The all-streams rule cannot acquire;
    quorum=3 does, with the correct timing, on BOTH the coarse and the
    full-scan impls."""
    from rub_mimo_tpu.config import Detector, Modulation, tiny_config
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    base = dict(num_streams=4, bit_exact=False, pid_max=4,
                modulation=Modulation.QAM16, detector=Detector.MMSE,
                mmse_noise_var=1e-3)
    cfg_all = tiny_config(**base)
    cfg_q = tiny_config(sync_quorum=3, **base)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=500, seed=21)
    cap, tx, _ = simulator.simulate_capture(cfg_all, spec)
    cap = np.array(cap)  # writable copy
    # reference timing from the clean capture
    ref = rx.decode(jnp.asarray(cap), cfg_all)
    assert bool(ref.synced)
    # jam stream 3: ~10 dB SNR caps its metric at (SNR/(1+SNR))^2 ~ 0.83
    rng = np.random.default_rng(0)
    p3 = np.mean(np.abs(cap[3]) ** 2)
    noise = (rng.normal(size=cap.shape[-1])
             + 1j * rng.normal(size=cap.shape[-1]))
    cap[3] += (np.sqrt(p3 / 10.0 / 2.0) * noise).astype(np.complex64)

    r_all = rx.decode(jnp.asarray(cap), cfg_all)
    assert not bool(r_all.synced)
    for impl in ("coarse", "xla"):
        r_q = rx.decode(jnp.asarray(cap), cfg_q, sync_impl=impl)
        assert bool(r_q.synced), impl
        assert abs(int(r_q.sync_index) - int(ref.sync_index)) <= 2, impl
        # streams 0-2 payloads survive (stream 3's noisy observations
        # degrade the 4x4 MMSE solve slightly; allow < 1% symbol errors)
        n = cfg_q.pid_max * cfg_q.M_occupied
        errs = np.asarray(r_q.rx_data)[:3, :n] != np.asarray(tx)[:3, :n]
        assert errs.mean() < 0.01, (impl, errs.sum())
