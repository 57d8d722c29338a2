"""Fault-injection recovery tests + batched (serving) decode."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import capture as capio
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import report, rx


@pytest.fixture(scope="module")
def base():
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=7)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    return cfg, np.asarray(cap), tx_data


def test_truncated_capture_partial_decode(base):
    """A capture cut mid-payload must sync and decode the frames that fit,
    flagging the rest invalid (the reference would hang waiting for its
    buffer to fill, SURVEY §5)."""
    cfg, cap, tx_data = base
    cut = simulator.inject_fault(cap, "truncate", position=0.4)  # mid-payload
    result = rx.decode(jnp.asarray(cut), cfg)
    assert bool(result.synced)
    valid = np.asarray(result.symbol_valid)
    assert 0 < valid.sum() < cfg.pid_max
    # the valid frames decode correctly
    rx_data = np.asarray(result.rx_data)
    m = cfg.M_occupied
    k = int(valid.sum())
    errs = (rx_data[:, : k * m] != tx_data[:, : k * m]).mean()
    assert errs < 0.02


def test_nan_burst_detected_by_ingest(base):
    cfg, cap, _ = base
    bad = simulator.inject_fault(cap, "nan_burst")
    checks = capio.validate_capture(bad)
    assert not checks["finite"]


def test_nan_burst_after_sync_does_not_kill_sync(base):
    """A NaN burst in the payload region: sync (before the burst) still
    fires; affected symbols demap to garbage but the pipeline completes."""
    cfg, cap, tx_data = base
    bad = simulator.inject_fault(cap, "nan_burst", position=0.9, length=64)
    result = rx.decode(jnp.asarray(bad), cfg)
    assert bool(result.synced)


def test_dropout_recovers(base):
    """A short zero dropout late in the payload only corrupts the touched
    frames."""
    cfg, cap, tx_data = base
    bad = simulator.inject_fault(cap, "dropout", position=0.95, length=32)
    result = rx.decode(jnp.asarray(bad), cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 20.0


@pytest.mark.slow
def test_batch_decode_matches_individual():
    """vmap'd decode over stacked captures == per-capture decode."""
    cfg = tiny_config(bit_exact=False, pid_max=4)
    caps, refs = [], []
    for seed in (3, 9, 21):
        spec = simulator.ChannelSpec(snr_db=35.0, delay=200 + seed * 10,
                                     seed=seed)
        cap, _, _ = simulator.simulate_capture(cfg, spec)
        caps.append(np.asarray(cap))
        refs.append(rx.decode(cap, cfg))
    T = min(c.shape[-1] for c in caps)
    batch = jnp.asarray(np.stack([c[:, :T] for c in caps]))
    dec = rx.make_batch_decoder(cfg)
    out = dec(batch)
    for i, ref in enumerate(refs):
        ref_cut = rx.decode(jnp.asarray(caps[i][:, :T]), cfg)
        np.testing.assert_array_equal(
            np.asarray(out.rx_data)[i], np.asarray(ref_cut.rx_data)
        )
        assert int(out.sync_index[i]) == int(ref_cut.sync_index)


def test_decode_zero_delay_edge():
    """Frame starting at sample 0 (no leading noise): sync and decode."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=0, seed=5)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0


def test_decode_no_trailing_margin():
    """Capture ending exactly at the last payload sample: every frame must
    still be valid and decoded."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=120, trailing=0, seed=5)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) < 1.0
    assert int(np.asarray(result.symbol_valid).sum()) == cfg.pid_max


def test_serving_scan_decoder_matches_single():
    """make_serving_decoder (lax.scan serving construct) must reproduce
    the per-capture decode exactly for every capture in the stack."""
    import jax

    cfg = tiny_config(bit_exact=False, pid_max=4)
    caps, txs = [], []
    for seed in (3, 9):
        spec = simulator.ChannelSpec(snr_db=30.0, delay=400 + 37 * seed,
                                     seed=seed)
        cap, tx, _ = simulator.simulate_capture(cfg, spec)
        caps.append(np.asarray(cap))
        txs.append(np.asarray(tx))
    T = min(c.shape[-1] for c in caps)
    stack = jnp.asarray(np.stack([c[:, :T] for c in caps]))
    serve = rx.make_serving_decoder(cfg)
    out = serve(stack)
    for i in range(2):
        ref = rx.decode(stack[i], cfg)
        assert bool(out.synced[i]) == bool(ref.synced) is True
        np.testing.assert_array_equal(np.asarray(out.rx_data[i]),
                                      np.asarray(ref.rx_data))

    planes = (jnp.real(stack).astype(jnp.float32),
              jnp.imag(stack).astype(jnp.float32))
    serve_p = rx.make_serving_decoder(cfg, input_format="planes")
    out_p = serve_p(*planes)
    np.testing.assert_array_equal(np.asarray(out_p.rx_data),
                                  np.asarray(out.rx_data))
