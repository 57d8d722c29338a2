"""Pallas kernel tests (interpret mode on CPU; compiled path on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.sync import schmidl_cox


def _pallas_interpret_metric(x, M, block):
    """Run the pallas kernel in interpreter mode (CPU-safe)."""
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    from rub_mimo_tpu.kernels import sc_metric

    with pltpu.force_tpu_interpret_mode():
        return sc_metric.sc_metric_pallas(x, M, block=block)


@pytest.mark.parametrize("T,block", [(1000, 64), (777, 128)])
def test_sc_metric_pallas_matches_xla(T, block):
    M = 32
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))).astype(
        np.complex64
    )
    want, _ = schmidl_cox.sc_metric(jnp.asarray(x), M, block=block)
    got = _pallas_interpret_metric(jnp.asarray(x), M, block)
    want = np.asarray(want)
    got = np.asarray(got)
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-3, atol=1e-4)


def test_sc_metric_pallas_detects_preamble():
    from rub_mimo_tpu.config import tiny_config
    from rub_mimo_tpu.io import simulator

    cfg = tiny_config()
    spec = simulator.ChannelSpec(snr_db=30.0, delay=300, seed=5)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    got = _pallas_interpret_metric(cap, cfg.M, 256)
    synced, t_star, starts, _ = schmidl_cox.plateau_scan(
        got, cfg.cp_len, cfg.plateau_threshold
    )
    assert bool(synced)


def test_demap_kernel_matches_demodulate():
    """kernels.eq_demap.demap (interpret) must produce the exact indices
    of ofdm.constellation.demodulate (same scores, first-max ties)."""
    import numpy as np
    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.kernels.eq_demap import demap, demap_supported
    from rub_mimo_tpu.ofdm import constellation

    assert demap_supported(2048, 32)
    assert not demap_supported(64, 32)
    rng = np.random.default_rng(5)
    Y = jnp.asarray((rng.normal(size=(2, 16, 256))
                     + 1j * rng.normal(size=(2, 16, 256))
                     ).astype(np.complex64))
    tab = np.asarray(constellation.table(Modulation.ARB32OPT))
    got = demap(Y, tab, interpret=True)
    want = constellation.demodulate(Y, Modulation.ARB32OPT)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
