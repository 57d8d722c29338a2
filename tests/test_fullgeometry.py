"""Full reference geometry on CPU: M=2048, CP=152, 20 access codes.

Every other test runs the tiny geometry (M=64) for speed; this one pins
the real operating point (mimo/config.h:65-66,104: M=2048, cp=152,
num_access_codes=20, 2 streams) with a small pid_max so the whole decode
stays CPU-tractable (~1 M samples).  Guards against regressions that
only bite at scale (window sizing, matched-filter lane layout, plateau
widths at cp=152).
"""

import pytest
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


@pytest.mark.slow
def test_full_geometry_decode():
    cfg = ModemConfig(pid_max=8, bit_exact=False)  # reference dims
    assert cfg.M == 2048 and cfg.cp_len == 152
    assert cfg.num_access_codes == 20 and cfg.num_streams == 2
    spec = simulator.ChannelSpec(snr_db=30.0, delay=3000, seed=9)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)

    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) == 0.0, rep.symbol_error_rate
    # plateau really is wider than the 152-sample CP at this geometry
    ps = np.asarray(result.plateau_start)
    pe = np.asarray(result.plateau_end)
    assert (pe - ps).min() > cfg.cp_len


def test_full_geometry_bit_exact_mode():
    """The bit_exact replication path (identity-biased Ghat, per-code
    timing argmax) at the real dims.  The replicated reference bug — Ghat
    initialized to identity and never zeroed before the LS accumulation
    (framing.cc:302-319) — makes decode quality depend on how the drawn
    channel composes with the diagonal bias (some realizations decode
    clean, others don't, faithfully to the reference); this pins a
    well-conditioned realization.  The robust mode (test above) is clean
    on arbitrary channels."""
    cfg = ModemConfig(pid_max=6, bit_exact=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=2500, seed=9)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 0.01, rep.symbol_error_rate
