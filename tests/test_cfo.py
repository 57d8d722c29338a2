"""CFO estimation tests: coarse (S&C) + residual (access-code phases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.estimate import cfo as cfo_mod
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx
from rub_mimo_tpu.sync import matched_filter, schmidl_cox


def test_residual_cfo_estimate():
    """Inject a small CFO; with coarse correction disabled, the residual
    estimator must recover it from the access-code peak phases."""
    cfg = tiny_config(bit_exact=False)
    eps = 0.006  # small: the unambiguous residual range is M/(2*S*sym)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=7,
                                 cfo_subcarriers=eps)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    sync = schmidl_cox.synchronize(cap, cfg)
    assert bool(sync.synced)
    window = rx._extract_window(cap, sync.sync_index, cfg)
    mf = matched_filter.search(window, cfg, joint=True)
    got = float(cfo_mod.residual_cfo(window, mf.ac_index, cfg))
    assert abs(got - eps) < 0.002, f"residual {got} vs injected {eps}"


def test_residual_cfo_zero_when_clean():
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=7)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    sync = schmidl_cox.synchronize(cap, cfg)
    window = rx._extract_window(cap, sync.sync_index, cfg)
    mf = matched_filter.search(window, cfg, joint=True)
    got = float(cfo_mod.residual_cfo(window, mf.ac_index, cfg))
    assert abs(got) < 0.002


def test_two_stage_cfo_decode():
    """Coarse+residual correction decodes cleanly under a CFO that wrecks
    the uncorrected pipeline."""
    cfg_on = tiny_config(bit_exact=False, correct_cfo=True)
    cfg_off = tiny_config(bit_exact=False, correct_cfo=False)
    eps = 0.11
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=eps)
    cap, tx_data, _ = simulator.simulate_capture(cfg_on, spec)

    r_on = rx.decode(cap, cfg_on)
    rep_on = report.score(r_on, tx_data, cfg_on)
    assert rep_on.synced
    assert abs(rep_on.cfo_hat - eps) < 0.02
    assert max(rep_on.symbol_error_rate) < 2.0

    r_off = rx.decode(cap, cfg_off)
    rep_off = report.score(r_off, tx_data, cfg_off)
    # without correction the same capture performs far worse
    assert max(rep_off.symbol_error_rate) > max(rep_on.symbol_error_rate)
