"""Multi-burst decode: several frame bursts in one continuous capture."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.ofdm import framegen
from rub_mimo_tpu.pipeline import report, rx


def test_decode_all_two_bursts():
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=0, trailing=0, seed=5)
    h = simulator.draw_channel(spec, 2, 2)

    data1 = framegen.generate_payload_symbols(cfg, seed=1)
    data2 = framegen.generate_payload_symbols(cfg, seed=2)
    tx1 = framegen.transmit_frame(cfg, jnp.asarray(data1))
    tx2 = framegen.transmit_frame(cfg, jnp.asarray(data2))
    gap = cfg.window_len + 3 * cfg.symbol_len
    tx = jnp.concatenate(
        [
            jnp.zeros((2, 300), jnp.complex64), tx1,
            jnp.zeros((2, gap - tx1.shape[-1]), jnp.complex64)
            if gap > tx1.shape[-1] else jnp.zeros((2, 64), jnp.complex64),
            tx2,
            jnp.zeros((2, 500), jnp.complex64),
        ],
        axis=-1,
    )
    cap = simulator.apply_channel(tx, h, spec, cfg)

    results = rx.decode_all(cap, cfg, max_bursts=4)
    assert len(results) == 2
    rep1 = report.score(results[0], data1, cfg)
    rep2 = report.score(results[1], data2, cfg)
    assert rep1.synced and rep2.synced
    assert max(rep1.symbol_error_rate) < 1.0
    assert max(rep2.symbol_error_rate) < 1.0
    # second burst found after the first
    assert int(results[1].sync_index) > int(results[0].sync_index)


def test_decode_all_single_burst_stops():
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=7)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    results = rx.decode_all(cap, cfg, max_bursts=4)
    assert len(results) == 1
