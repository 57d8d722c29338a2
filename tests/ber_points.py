"""Shared deterministic BER measurement grid.

One place defines WHICH operating points are pinned (mode, detector,
modulation, SNRs, seeds) so the golden generator
(scripts/gen_ber_golden.py) and the regression test
(tests/test_ber_curves.py) can never drift apart.  Each point averages a
fixed set of seeds of the tiny geometry — fully deterministic, so the
checked-in values reproduce exactly on the same software stack and
within tolerance across XLA versions.
"""

from __future__ import annotations

import numpy as np

from rub_mimo_tpu.config import (
    CommMode, Detector, ModemConfig, Modulation,
)
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx

_SEEDS = (5, 6, 7)

GRID = {
    "siso_qpsk": {
        "snrs": [8.0, 11.0, 14.0],
        "cfg": dict(
            num_subcarriers=64, cp_len=16, num_streams=1,
            num_access_codes=4, pid_max=64,
            modulation=Modulation.QPSK, mode=CommMode.SISO,
            siso_tx=0, siso_rx=0, bit_exact=False,
            plateau_threshold=0.5,
        ),
        "spec": dict(delay=333, identity=True),
    },
    "mimo2x2_zf_qam16": {
        "snrs": [14.0, 18.0, 22.0],
        "cfg": dict(
            num_subcarriers=64, cp_len=16, num_streams=2,
            num_access_codes=4, pid_max=64,
            modulation=Modulation.QAM16, bit_exact=False,
            sync_fallback=True,
        ),
        "spec": dict(delay=333),
    },
    "mimo2x2_mmse_qam16": {
        "snrs": [14.0, 18.0, 22.0],
        "cfg": dict(
            num_subcarriers=64, cp_len=16, num_streams=2,
            num_access_codes=4, pid_max=64,
            modulation=Modulation.QAM16, bit_exact=False,
            detector=Detector.MMSE, mmse_auto_noise=True,
            sync_fallback=True,
        ),
        "spec": dict(delay=333),
    },
    "mimo2x2_ml_qam16": {
        "snrs": [14.0, 18.0],
        "cfg": dict(
            num_subcarriers=64, cp_len=16, num_streams=2,
            num_access_codes=4, pid_max=64,
            modulation=Modulation.QAM16, bit_exact=False,
            detector=Detector.ML, sync_fallback=True,
        ),
        "spec": dict(delay=333),
    },
}


def measure_point(key: str, snr_db: float) -> float:
    """Mean SER over the fixed seed set for one grid point."""
    point = GRID[key]
    cfg = ModemConfig(**point["cfg"])
    sers = []
    for seed in _SEEDS:
        spec = simulator.ChannelSpec(
            snr_db=snr_db, seed=seed, **point["spec"]
        )
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        result = rx.decode(cap, cfg)
        rep = report.score(result, tx_data, cfg)
        assert rep.synced, (key, snr_db, seed)
        sers.append(max(rep.symbol_error_rate) / 100.0)
    return float(np.mean(sers))
