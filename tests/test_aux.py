"""Tests for auxiliary subsystems: devices, checkpoint/resume, profiling."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import devices, simulator
from rub_mimo_tpu.pipeline import checkpoint, report, rx
from rub_mimo_tpu.utils import profiling


# ------------------------------------------------------------- devices
def test_parse_addr_string():
    d = devices.Device.from_addr_string(
        "type=b200,serial=308F955,product=B210,name=MyB210"
    )
    assert d.type == "b200"
    assert d.serial == "308F955"
    assert d.product == "B210"
    assert d.subdev_spec_tx == "A:B A:A"  # B210 spec (config.h:47)
    assert d.subdev_spec_rx == "A:A A:B"


def test_find_and_registry_roundtrip(tmp_path):
    devs = devices.find_devices()
    assert len(devs) == 6  # the reference lab's radios (config.h:37-42)
    assert any(d.serial == "308F965" for d in devs)
    p = tmp_path / "dev_config.json"
    devices.save_registry(devs, p)
    back = devices.load_registry(p)
    assert [d.name for d in back] == [d.name for d in devs]


def test_subdev_specs_per_model():
    assert devices.SUBDEV_SPECS["x300"]["tx"] == "A:0 B:0"
    assert devices.SUBDEV_SPECS["usrp2"]["rx"] == "A:0"


# -------------------------------------------------------- checkpointing
def test_checkpoint_resume_matches_full_decode(tmp_path):
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=222, seed=21)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    p = tmp_path / "run.npz"
    checkpoint.save(p, cfg, result)

    ck = checkpoint.load(p)
    assert ck.synced
    assert ck.sync_index == int(result.sync_index)
    np.testing.assert_array_equal(ck.rx_data, np.asarray(result.rx_data))

    # resume from frame 0: must reproduce the full decode's symbols
    rx_sig, rx_data = checkpoint.resume_decode(cap, ck)
    np.testing.assert_array_equal(
        np.asarray(rx_data), np.asarray(result.rx_data)
    )

    # resume mid-run (frame 3): tail must match
    k = 3
    _, rx_tail = checkpoint.resume_decode(cap, ck, from_frame=k)
    m = cfg.M_occupied
    np.testing.assert_array_equal(
        np.asarray(rx_tail),
        np.asarray(result.rx_data)[:, k * m :],
    )


def test_checkpoint_preserves_config(tmp_path):
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=100, seed=2)
    cap, _, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    p = tmp_path / "run.npz"
    checkpoint.save(p, cfg, result)
    assert checkpoint.load(p).config == cfg


# ------------------------------------------------------------ profiling
def test_stage_timer():
    t = profiling.StageTimer()
    x = jnp.arange(1024.0)
    out = t.time_stage("square", lambda a: a * a, x, samples=1024, iters=2)
    assert out.shape == (1024,)
    rep = t.report()
    assert "square" in rep
    assert rep["square"]["samples_per_second"] > 0
    t.print()


def test_trace_context(tmp_path):
    import jax

    with profiling.trace(str(tmp_path)):
        with profiling.annotate("unit-test-span"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a trace directory must have been produced
    assert any(tmp_path.iterdir())


def test_checkpoint_resume_rx_diversity(tmp_path):
    """Regression (code review): resume_decode must re-combine with MRC
    for RX_DIVERSITY checkpoints (the saved W is a zero placeholder)."""
    from rub_mimo_tpu.config import CommMode

    cfg = tiny_config(bit_exact=False, mode=CommMode.RX_DIVERSITY, siso_tx=0)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=222, seed=21,
                                 diagonal_dominance=1.0)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    assert bool(result.synced)
    p = tmp_path / "div.npz"
    checkpoint.save(p, cfg, result)
    _, rx_data = checkpoint.resume_decode(cap, checkpoint.load(p))
    np.testing.assert_array_equal(
        np.asarray(rx_data), np.asarray(result.rx_data)
    )


@pytest.mark.slow
def test_checkpoint_resume_cfo_and_alamouti(tmp_path):
    """Regression (code review round 2): resume must re-apply the saved
    CFO derotations (coarse+residual, correct phase references) and
    support ALAMOUTI recombining."""
    from rub_mimo_tpu.config import CommMode

    # CFO case
    cfg = tiny_config(bit_exact=False, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    result = rx.decode(cap, cfg)
    assert bool(result.synced)
    p = tmp_path / "cfo.npz"
    checkpoint.save(p, cfg, result)
    _, rx_data = checkpoint.resume_decode(cap, checkpoint.load(p))
    np.testing.assert_array_equal(
        np.asarray(rx_data), np.asarray(result.rx_data)
    )

    # ALAMOUTI case
    cfg_a = tiny_config(bit_exact=False, mode=CommMode.ALAMOUTI)
    spec_a = simulator.ChannelSpec(snr_db=30.0, delay=333, seed=9)
    cap_a, txd_a, _ = simulator.simulate_capture(cfg_a, spec_a)
    r_a = rx.decode(cap_a, cfg_a)
    assert bool(r_a.synced)
    pa = tmp_path / "ala.npz"
    checkpoint.save(pa, cfg_a, r_a)
    _, rxd_a = checkpoint.resume_decode(cap_a, checkpoint.load(pa))
    np.testing.assert_array_equal(
        np.asarray(rxd_a), np.asarray(r_a.rx_data)
    )
    with pytest.raises(ValueError):
        checkpoint.resume_decode(cap_a, checkpoint.load(pa), from_frame=3)
