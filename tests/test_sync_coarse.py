"""Coarse+refine sync (_synchronize_coarse) vs the full scan.

The fast path must be decision-identical to the chunked full scan on
every capture — including adversarial ones engineered to hit its edge
machinery: false coarse candidates, per-stream runs longer than the
run-start window (exactness fallback), fires near the capture tail, and
no-fire defaults."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.sync import schmidl_cox as sc


def _agree(cap, cfg):
    full = sc.synchronize(cap, cfg, impl="xla")
    fast = sc.synchronize(cap, cfg, impl="auto")
    assert bool(full.synced) == bool(fast.synced)
    assert int(full.sync_sample) == int(fast.sync_sample)
    assert int(full.sync_index) == int(fast.sync_index)
    np.testing.assert_array_equal(
        np.asarray(full.plateau_start), np.asarray(fast.plateau_start)
    )
    assert abs(float(full.cfo_hat) - float(fast.cfo_hat)) < 1e-4
    return full


@pytest.mark.parametrize("delay", [64, 130, 501, 1000, 2000])
def test_coarse_matches_full_on_captures(delay):
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=delay, seed=delay)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    _agree(cap, cfg)


def test_coarse_noise_only_defaults():
    cfg = tiny_config(bit_exact=False)
    rng = np.random.default_rng(1)
    cap = jnp.asarray((0.01 * (
        rng.standard_normal((2, 8192)) + 1j * rng.standard_normal((2, 8192))
    )).astype(np.complex64))
    full = _agree(cap, cfg)
    assert not bool(full.synced)


def _tone(T, start, length, freq=0.11, amp=1.0):
    t = np.arange(T)
    env = ((t >= start) & (t < start + length)).astype(np.float32)
    return (amp * env * np.exp(2j * np.pi * freq * t)).astype(np.complex64)


def test_coarse_long_run_fallback():
    """Stream 0 carries a tone from early on (its plateau run far exceeds
    the run-start window when stream 1 finally joins) — the fast path
    must detect the saturated run and fall back, reproducing the full
    scan exactly."""
    cfg = tiny_config(bit_exact=False)
    T = 8192
    rng = np.random.default_rng(3)
    noise = (0.003 * (rng.standard_normal((2, T))
                      + 1j * rng.standard_normal((2, T)))
             ).astype(np.complex64)
    cap = np.stack([
        _tone(T, 200, 7000),          # long early run on stream 0
        _tone(T, 3000, 4000),         # stream 1 joins much later
    ]) + noise
    full = _agree(jnp.asarray(cap), cfg)
    assert bool(full.synced)
    # the run really is longer than the refinement window
    run_w = 2 * cfg.M + 2 * cfg.cp_len
    starts = np.asarray(full.plateau_start)
    assert int(full.sync_sample) - starts.min() > run_w


def test_coarse_false_candidates_then_real_frame():
    """Short dual-stream tone blips create coarse candidate pairs that
    refine to no-fire; the real frame afterwards must still be found at
    the full scan's exact index."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=2500, seed=9)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    cap = np.asarray(cap)
    T = cap.shape[-1]
    # blips: strong short tones on both streams (above-threshold metric
    # for less than cp+2 consecutive samples)
    for s0 in (100, 600, 1100):
        blip = _tone(T, s0, cfg.M // 2 + 4, amp=2.0)
        cap = cap + np.stack([blip, blip])
    full = _agree(jnp.asarray(cap), cfg)
    assert bool(full.synced)


def test_coarse_fire_near_capture_tail():
    """A frame whose preamble sits at the very end of the capture (the
    coarse grid's tail blind spot) — the tail guard must find it iff the
    full scan does."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=0, trailing=0, seed=2)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    cap = np.asarray(cap)
    # keep just enough capture for the sync preamble plus a morsel, so
    # the fire lands within the last couple of coarse blocks
    full_ref = sc.synchronize(jnp.asarray(cap), cfg, impl="xla")
    t_fire = int(full_ref.sync_sample)
    D = sc._coarse_stride(cfg)
    end = t_fire + 2 * D + 2
    _agree(jnp.asarray(cap[:, :end]), cfg)
