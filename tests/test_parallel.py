"""Multi-device sharded decode tests on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import Detector, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
from rub_mimo_tpu.pipeline import rx


def _capture(cfg, seed=11, delay=501, snr=35.0):
    spec = simulator.ChannelSpec(snr_db=snr, delay=delay, seed=seed)
    return simulator.simulate_capture(cfg, spec)


@pytest.mark.parametrize(
    "n_time,n_sc", [(2, 1), (4, 1), (8, 1), (4, 2), (2, 4), (1, 8)]
)
def test_sharded_matches_single_device(n_time, n_sc):
    """The sharded decode must reproduce the single-chip decode exactly
    (same argmaxes, same demodulated symbols) on every mesh shape —
    including subcarrier-heavy (2,4) and pure-'sc' (1,8) splits, where the
    matched-filter templates, LS code FFTs, payload symbols, and
    per-subcarrier equalization all shard over the second axis."""
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg)
    ref = rx.decode(cap, cfg)

    m = mesh_mod.make_mesh(n_time, n_sc)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)

    assert bool(got.synced) == bool(ref.synced) == True  # noqa: E712
    assert int(got.sync_index) == int(ref.sync_index)
    assert int(got.sync_sample) == int(ref.sync_sample)
    assert int(got.decode_start) == int(ref.decode_start)
    np.testing.assert_allclose(
        np.asarray(got.G), np.asarray(ref.G), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


def test_sharded_sync_plateau_spans_shards():
    """A plateau that straddles a shard boundary must still fire with the
    correct global run start (the cross-shard prefix-max carry)."""
    cfg = tiny_config(bit_exact=False)
    # put the frame so the S0 plateau crosses the boundary of an 8-way split
    cap, tx_data, _ = _capture(cfg, seed=3, delay=0)
    T = cap.shape[-1]
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    # choose a delay that places sync_sample near a boundary for n=8
    m = mesh_mod.make_mesh(8, 1)
    tloc = -(-T // 8)
    # shift so the fire sample lands a few samples after a boundary
    want = int(ref.sync_sample)
    shift = (tloc - want % tloc) + 3
    cap2 = jnp.pad(cap, ((0, 0), (shift, 0)))[:, : T + shift]
    ref2 = rx.decode(cap2, cfg)
    iq = mesh_mod.shard_capture(cap2, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced)
    assert int(got.sync_index) == int(ref2.sync_index)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref2.rx_data)
    )


def test_sharded_no_sync():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    T = cfg.window_len
    noise = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))
             ).astype(np.complex64) * 0.01
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(jnp.asarray(noise), m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert not bool(got.synced)


def test_sharded_mmse():
    cfg = tiny_config(detector=Detector.MMSE, mmse_noise_var=1e-3,
                      bit_exact=False)
    cap, tx_data, _ = _capture(cfg, seed=4, delay=130)
    ref = rx.decode(cap, cfg)
    m = mesh_mod.make_mesh(4, 2)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


@pytest.mark.parametrize("detector", [Detector.ML, Detector.SIC])
def test_sharded_ml_sic_over_sc_axis(detector):
    """ML lattice search and SIC V-BLAST are per-subcarrier independent,
    so the 'sc'-sharded equalize stage must reproduce them exactly."""
    cfg = tiny_config(bit_exact=False, detector=detector,
                      mmse_noise_var=1e-3, pid_max=8)
    cap, tx_data, _ = _capture(cfg, seed=7, delay=222)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    m = mesh_mod.make_mesh(2, 4)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


def test_sc_axis_divides_payload_work():
    """The (4,2) mesh must put DIFFERENT payload symbols on the two 'sc'
    ranks (work division, not replication): with n_sc=2 each device FFTs
    ceil(nloc/2) symbols instead of nloc."""
    from rub_mimo_tpu.parallel.decode_sharded import _chunk

    # structural guarantee proxy: the striping arithmetic partitions slots
    nloc = 11
    chunk, npad = _chunk(nloc, 2)
    slots0 = {0 + 2 * i for i in range(chunk)}
    slots1 = {1 + 2 * i for i in range(chunk)}
    assert slots0 & slots1 == set()
    assert set(range(nloc)) <= (slots0 | slots1)


@pytest.mark.slow
def test_multihost_demo_script():
    """True multi-process multihost: 2 OS processes x 2 CPU devices joined
    via jax.distributed, sharded decode spanning both (gloo collectives);
    see benchmarks/multihost_demo.py."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "benchmarks" / "multihost_demo.py"
    env = dict(**__import__("os").environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, str(script)], env=env,
        capture_output=True, text=True, timeout=500,
    )
    assert "multihost demo: OK" in out.stdout, out.stdout + out.stderr


def test_sharded_mmse_auto_noise_and_diversity_match():
    """Regression (code review): the sharded decode must honour
    mmse_auto_noise and implement the RX_DIVERSITY combiner."""
    from rub_mimo_tpu.config import CommMode, Detector

    for cfg in (
        tiny_config(bit_exact=False, detector=Detector.MMSE,
                    mmse_auto_noise=True, mmse_noise_var=10.0),
        tiny_config(bit_exact=False, mode=CommMode.RX_DIVERSITY, siso_tx=0),
    ):
        cap, tx_data, _ = _capture(cfg, seed=4, delay=130)
        ref = rx.decode(cap, cfg)
        assert bool(ref.synced)
        m = mesh_mod.make_mesh(4, 1)
        iq = mesh_mod.shard_capture(cap, m)
        dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
        got = dec(iq)
        np.testing.assert_array_equal(
            np.asarray(got.rx_data), np.asarray(ref.rx_data)
        )


def test_sharded_cfo_correction_matches_offline():
    """CFO support in the sharded decode (coarse from the elected S&C
    correlation + residual from the replicated region, all derotations on
    a global phase reference) must reproduce the offline CFO decode."""
    cfg = tiny_config(bit_exact=False, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced)
    assert abs(float(got.cfo_hat) - float(ref.cfo_hat)) < 1e-4
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


def test_sharded_sync_fallback_matches_offline():
    """S0-xcorr fallback in the sharded decode: a low-SNR capture the
    plateau cannot acquire must decode identically to the offline
    fallback path."""
    cfg = tiny_config(bit_exact=False, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=10.0, delay=350, seed=13)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced)
    assert int(got.sync_index) == int(ref.sync_index)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


@pytest.mark.slow
def test_sharded_track_phase_matches_offline():
    cfg = tiny_config(bit_exact=False, track_phase=True, pid_max=16)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=0.004)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


def test_sharded_fallback_with_cfo_matches_offline():
    """Fallback sync + CFO correction combined, sharded == offline."""
    cfg = tiny_config(bit_exact=False, sync_fallback=True, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=12.0, delay=350, seed=13,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced)
    assert abs(float(got.cfo_hat) - float(ref.cfo_hat)) < 1e-3
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )


@pytest.mark.slow
def test_sharded_batch_serving_matches_single_device():
    """Data-parallel serving: 8 captures sharded over the 8-device mesh
    decode identically to the single-device batch decoder, each with its
    own sync point and CSI."""
    from rub_mimo_tpu.parallel import serving

    cfg = tiny_config(bit_exact=False, pid_max=8)
    caps, txs = [], []
    for i in range(8):
        spec = simulator.ChannelSpec(snr_db=30.0, delay=301 + 37 * i,
                                     seed=100 + i)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        caps.append(np.asarray(cap))
        txs.append(tx_data)
    T = max(c.shape[-1] for c in caps)
    batch = np.stack([
        np.pad(c, ((0, 0), (0, T - c.shape[-1]))) for c in caps
    ])

    ref = rx.make_batch_decoder(cfg)(jnp.asarray(batch))

    m = mesh_mod.make_mesh(8, 1)
    sharded = serving.shard_batch(batch, m)
    got = serving.make_sharded_batch_decoder(cfg, m)(sharded)

    assert bool(np.asarray(got.synced).all())
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )
    np.testing.assert_array_equal(
        np.asarray(got.sync_index), np.asarray(ref.sync_index)
    )


def test_sharded_batch_serving_validation():
    from rub_mimo_tpu.parallel import serving

    m = mesh_mod.make_mesh(8, 1)
    with pytest.raises(ValueError):
        serving.shard_batch(np.zeros((3, 2, 64), np.complex64), m)


def test_sharded_planes_input_matches_complex():
    """build_sharded_decoder(input_format='planes') fed via
    shard_capture_planes must reproduce the complex-input decoder
    exactly (round 5: the plane path removes the c64 staging copies)."""
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg)
    m = mesh_mod.make_mesh(4, 2)
    iq = mesh_mod.shard_capture(cap, m)
    dec_c = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    ref = dec_c(iq)
    planes = mesh_mod.shard_capture_planes(cap, m)
    dec_p = decode_sharded.build_sharded_decoder(
        cfg, m, planes[0].shape[-1], input_format="planes")
    got = dec_p(*planes)
    assert bool(got.synced) and bool(ref.synced)
    assert int(got.sync_index) == int(ref.sync_index)
    np.testing.assert_array_equal(np.asarray(got.rx_data),
                                  np.asarray(ref.rx_data))
    np.testing.assert_array_equal(np.asarray(got.rx_sig),
                                  np.asarray(ref.rx_sig))


def test_sharded_quorum_matches_offline():
    """Sharded decode with a quorum config (coarse fast path gated off)
    must match the offline quorum decode."""
    cfg = tiny_config(bit_exact=False, num_streams=4, pid_max=4,
                      sync_quorum=3)
    cap, tx_data, _ = _capture(cfg, seed=23)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced)
    assert int(got.sync_index) == int(ref.sync_index)
    np.testing.assert_array_equal(np.asarray(got.rx_data),
                                  np.asarray(ref.rx_data))
