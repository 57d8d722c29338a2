"""Soak test: many random seeds x modes must all sync and decode.

Guards against flaky acquisition/estimation corner cases (the kind the
reference could only discover over the air, run_exe.sh's 90-repeat loop).
"""

import numpy as np
import pytest

from rub_mimo_tpu.config import CommMode, Detector, Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


SEEDS = [101, 202, 303, 404, 505, 606, 707, 808]


@pytest.mark.parametrize("seed", SEEDS)
def test_soak_2x2_zf(seed):
    cfg = tiny_config(bit_exact=False)
    rng = np.random.default_rng(seed)
    spec = simulator.ChannelSpec(
        snr_db=float(rng.uniform(25, 40)),
        delay=int(rng.integers(64, 900)),
        seed=seed,
    )
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec,
                                                 payload_seed=seed)
    rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
    assert rep.synced, f"seed {seed} failed to sync"
    assert max(rep.symbol_error_rate) < 2.0, (
        f"seed {seed}: SER {rep.symbol_error_rate}"
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS[:4])
def test_soak_modes(seed):
    for cfg in (
        tiny_config(bit_exact=False, detector=Detector.MMSE,
                    mmse_noise_var=1e-3),
        tiny_config(bit_exact=False, modulation=Modulation.QAM16),
        tiny_config(bit_exact=False, mode=CommMode.RX_DIVERSITY, siso_tx=0),
    ):
        spec = simulator.ChannelSpec(snr_db=35.0,
                                     delay=100 + 37 * seed % 700, seed=seed)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        rep = report.score(rx.decode(cap, cfg), tx_data, cfg)
        assert rep.synced, f"{cfg.mode}/{cfg.detector} seed {seed}"
        assert max(rep.symbol_error_rate) < 3.0, (
            f"{cfg.mode}/{cfg.detector} seed {seed}: {rep.symbol_error_rate}"
        )


@pytest.mark.parametrize("seed", SEEDS[:4])
def test_soak_joint_timing_never_worse_than_reference(seed):
    """The reference's independent per-code timing argmax (bit_exact) can
    mislocate peaks on unlucky channel draws (its own FIXME at
    framing.cc:797-800) — e.g. seed 404 yields 6.25%% SER.  The robust
    joint mode must never do worse on the same capture."""
    spec = simulator.ChannelSpec(snr_db=35.0,
                                 delay=100 + 37 * seed % 700, seed=seed)
    cfg_ref = tiny_config(bit_exact=True)
    cap, tx_data, _ = simulator.simulate_capture(cfg_ref, spec)
    rep_ref = report.score(rx.decode(cap, cfg_ref), tx_data, cfg_ref)
    cfg_joint = tiny_config(bit_exact=False)
    rep_joint = report.score(rx.decode(cap, cfg_joint), tx_data, cfg_joint)
    assert rep_ref.synced and rep_joint.synced
    assert max(rep_ref.symbol_error_rate) < 15.0
    assert (
        max(rep_joint.symbol_error_rate)
        <= max(rep_ref.symbol_error_rate) + 0.1
    )
    assert max(rep_joint.symbol_error_rate) < 2.0
