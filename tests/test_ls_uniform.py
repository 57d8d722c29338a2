"""estimate.ls uniform (joint-timing grid) extraction must be
bit-identical to the per-window dynamic-slice scan: both are pure copies
of the same region samples feeding the same batched FFT."""

import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.estimate import ls


def _small_cfg():
    return ModemConfig(
        num_subcarriers=64, cp_len=16, num_access_codes=3, num_streams=2,
        pid_max=4, bit_exact=False,
    )


def test_uniform_grid_matches_scan():
    cfg = _small_cfg()
    S, sym = cfg.num_streams, cfg.symbol_len
    n_seq = 1 + cfg.num_access_codes * S
    region_len = sym * n_seq + cfg.M
    rng = np.random.default_rng(7)
    region = (rng.standard_normal((S, region_len))
              + 1j * rng.standard_normal((S, region_len))
              ).astype(np.complex64)
    for i0 in (0, 1, 37, sym - 1):  # every in-range joint argmax position
        ac_index = np.broadcast_to(
            i0 + (1 + np.arange(n_seq - 1, dtype=np.int32)) * sym,
            (S, n_seq - 1),
        )
        offs = ls.ac_offsets(jnp.asarray(ac_index), cfg)
        x_scan = ls.code_ffts(jnp.asarray(region), offs, cfg)
        x_grid = ls.code_ffts(jnp.asarray(region), offs, cfg, uniform=True)
        np.testing.assert_array_equal(np.asarray(x_scan),
                                      np.asarray(x_grid),
                                      err_msg=f"{i0=}")
        g_scan = ls.estimate_channel(jnp.asarray(region),
                                     jnp.asarray(ac_index), cfg)
        g_grid = ls.estimate_channel(jnp.asarray(region),
                                     jnp.asarray(ac_index), cfg,
                                     uniform=True)
        np.testing.assert_array_equal(np.asarray(g_scan), np.asarray(g_grid))
