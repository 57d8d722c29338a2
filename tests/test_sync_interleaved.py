"""sync impl "coarse128" (interleaved tile-aligned block sums) must make
the same sync decisions as "coarse" — the summed values are the same 64
complex terms per block, reassociated; decisions are integer-robust."""

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.sync import schmidl_cox


def test_coarse128_matches_coarse():
    cfg = ModemConfig(pid_max=8, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=4000, seed=11)
    capture, _, _ = simulator.simulate_capture(cfg, spec)
    x = jnp.asarray(capture)
    a = jax.jit(lambda v: schmidl_cox.synchronize(v, cfg, impl="coarse"))(x)
    b = jax.jit(
        lambda v: schmidl_cox.synchronize(v, cfg, impl="coarse128")
    )(x)
    assert bool(a.synced) and bool(b.synced)
    assert int(a.sync_index) == int(b.sync_index)
    assert int(a.sync_sample) == int(b.sync_sample)
    np.testing.assert_array_equal(np.asarray(a.plateau_start),
                                  np.asarray(b.plateau_start))
    # CFO comes from the same corr sample; identical copies -> identical
    np.testing.assert_allclose(float(a.cfo_hat), float(b.cfo_hat),
                               rtol=0, atol=1e-6)


def test_coarse_full128_matches():
    cfg = ModemConfig(pid_max=4, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=25.0, delay=2500, seed=12)
    capture, _, _ = simulator.simulate_capture(cfg, spec)
    x = jnp.asarray(capture)
    a = schmidl_cox.synchronize(x, cfg, impl="coarse_full")
    b = schmidl_cox.synchronize(x, cfg, impl="coarse_full128")
    assert int(a.sync_index) == int(b.sync_index)
    assert bool(a.synced) == bool(b.synced)
