"""End-to-end tests for the guard-band/pilot subcarrier variant.

The reference compiles this allocator out (USE_ALL_CARRIERS=true,
mimo/config.h:95) and has never run it; here it is a runtime option and
must work end-to-end — including the systematic sqrt(M/M_occ) amplitude
its mixed normalization conventions produce, and the optional
normalize_rx_scale compensation that makes QAM hard decisions work.
"""

import numpy as np
import pytest

from rub_mimo_tpu.config import Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


def _run(cfg, seed=11, snr=35.0, delay=300):
    spec = simulator.ChannelSpec(snr_db=snr, delay=delay, seed=seed)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    return result, report.score(result, tx_data, cfg)


def test_guardband_qpsk():
    cfg = tiny_config(use_all_carriers=False, modulation=Modulation.QPSK,
                      bit_exact=False)
    assert cfg.M_occupied < cfg.M
    result, rep = _run(cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) == 0.0


def test_guardband_scale_artifact_reproduced():
    """Reference conventions leave |rx_sig| ~= sqrt(M/M_occ) (SURVEY §7
    hard-part 5): replicated when normalize_rx_scale=False."""
    cfg = tiny_config(use_all_carriers=False, modulation=Modulation.QPSK,
                      bit_exact=False)
    result, rep = _run(cfg)
    mean_amp = np.abs(np.asarray(result.rx_sig)).mean()
    expect = np.sqrt(cfg.M / cfg.M_occupied)
    assert abs(mean_amp - expect) < 0.05 * expect


def test_guardband_qam16_with_normalization():
    cfg = tiny_config(use_all_carriers=False, modulation=Modulation.QAM16,
                      bit_exact=False, normalize_rx_scale=True)
    result, rep = _run(cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0
    # compensated amplitude ~ unit average energy
    mean_e = (np.abs(np.asarray(result.rx_sig)) ** 2).mean()
    assert abs(mean_e - 1.0) < 0.15


def test_guardband_qam64():
    """64-QAM is the scale-sensitive case: with compensation it decodes
    cleanly in the guard-band variant."""
    cfg = tiny_config(use_all_carriers=False, modulation=Modulation.QAM64,
                      bit_exact=False, normalize_rx_scale=True)
    result, rep = _run(cfg, snr=40.0)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0
