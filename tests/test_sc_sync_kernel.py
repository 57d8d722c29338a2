"""Fused one-pass Pallas sync kernel vs the chunked XLA path.

kernels/sc_sync.py runs the whole sync stage (metric, plateau carry,
first-fire election, CFO observable) in a single grid sweep with carried
SMEM state; interpret mode exercises the sequential-carry logic on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.kernels.sc_sync import sc_sync_fused
from rub_mimo_tpu.sync import schmidl_cox


@pytest.mark.parametrize(
    "delay,snr,block", [(501, 35.0, 512), (130, 30.0, 512),
                        (2000, 25.0, 1024), (64, 35.0, 256)]
)
def test_fused_sync_matches_xla(delay, snr, block):
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=snr, delay=delay, seed=11)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    ref = schmidl_cox.synchronize(cap, cfg)
    syn, t, starts, corr = sc_sync_fused(
        cap, cfg.M, cfg.cp_len, cfg.plateau_threshold, block=block,
        interpret=True,
    )
    assert bool(syn) == bool(ref.synced)
    assert int(t) == int(ref.sync_sample)
    np.testing.assert_array_equal(
        np.asarray(starts), np.asarray(ref.plateau_start)
    )
    # the CFO observable (corr at t*) matches within chunk-summation
    # rounding
    cfo_kernel = float(np.angle(np.sum(-np.asarray(corr))) / np.pi)
    assert abs(cfo_kernel - float(ref.cfo_hat)) < 1e-4


def test_fused_sync_no_fire_defaults():
    """Noise-only capture: no sync, and the no-fire defaults (t*=0,
    starts at t=0) match the XLA plateau_scan."""
    cfg = tiny_config(bit_exact=False)
    rng = np.random.default_rng(0)
    cap = jnp.asarray(
        (0.01 * (rng.standard_normal((2, 4096))
                 + 1j * rng.standard_normal((2, 4096)))).astype(np.complex64)
    )
    ref = schmidl_cox.synchronize(cap, cfg)
    syn, t, starts, _ = sc_sync_fused(
        cap, cfg.M, cfg.cp_len, cfg.plateau_threshold, block=512,
        interpret=True,
    )
    assert not bool(syn) and not bool(ref.synced)
    assert int(t) == int(ref.sync_sample) == 0
    np.testing.assert_array_equal(
        np.asarray(starts), np.asarray(ref.plateau_start)
    )


def test_fused_sync_siso_single_stream():
    cfg = tiny_config(
        bit_exact=False, num_streams=1, mode=CommMode.SISO,
        siso_tx=0, siso_rx=0, modulation=Modulation.QPSK,
        plateau_threshold=0.5,
    )
    spec = simulator.ChannelSpec(
        snr_db=30.0, delay=333, seed=5, identity=True
    )
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    ref = schmidl_cox.synchronize(cap, cfg)
    syn, t, starts, _ = sc_sync_fused(
        cap, cfg.M, cfg.cp_len, cfg.plateau_threshold, block=512,
        interpret=True,
    )
    assert bool(syn) == bool(ref.synced)
    assert int(t) == int(ref.sync_sample)


def test_synchronize_impl_pallas_end_to_end():
    """synchronize(impl='pallas') returns the same SyncResult fields as
    the XLA implementation on the same capture."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    a = schmidl_cox.synchronize(cap, cfg, impl="xla")
    b = schmidl_cox.synchronize(cap, cfg, impl="pallas")
    assert bool(a.synced) == bool(b.synced)
    assert int(a.sync_index) == int(b.sync_index)
    assert int(a.sync_sample) == int(b.sync_sample)
    assert abs(float(a.cfo_hat) - float(b.cfo_hat)) < 1e-4
