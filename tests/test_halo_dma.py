"""Pallas remote-DMA halo exchange vs the ppermute collective.

Runs the make_async_remote_copy kernel (kernels/halo_dma.py) in Pallas
TPU *interpret mode* on the virtual CPU mesh — interpret mode simulates
the inter-device DMAs and semaphores, so the kernel logic (neighbor
addressing, ring symmetry, edge masking) is validated without multi-chip
hardware (VERDICT round-1 item 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.kernels.halo_dma import ring_shift_right
from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
from rub_mimo_tpu.pipeline import rx


@pytest.mark.parametrize("shape", [(2, 1), (4, 1), (8, 1), (4, 2)])
def test_ring_shift_matches_ppermute(shape):
    n_time, n_sc = shape
    mesh = mesh_mod.make_mesh(n_time, n_sc)
    axes = tuple(mesh.axis_names)
    S, H = 2, 129
    rng = np.random.default_rng(7)
    x = (
        rng.standard_normal((S, n_time * H))
        + 1j * rng.standard_normal((S, n_time * H))
    ).astype(np.complex64)

    def pallas_path(local):
        return ring_shift_right(
            local, axis_name="time", mesh_axes=axes, n_dev=n_time,
            interpret=True,
        )

    def ppermute_path(local):
        if n_time == 1:
            return jnp.zeros_like(local)
        return jax.lax.ppermute(
            local, "time", [(j, j + 1) for j in range(n_time - 1)]
        )

    spec = P(None, "time")
    a = jax.jit(jax.shard_map(
        pallas_path, mesh=mesh, in_specs=spec, out_specs=spec
    ))(jnp.asarray(x))
    b = jax.jit(jax.shard_map(
        ppermute_path, mesh=mesh, in_specs=spec, out_specs=spec
    ))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n_time,n_sc", [(2, 1), (4, 2)])
def test_sharded_decode_with_pallas_halo(n_time, n_sc):
    """Full sharded decode with halo_impl='pallas_dma' must be bit-equal
    to the ppermute decode (sync election AND demodulated symbols)."""
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(n_time, n_sc)
    iq = mesh_mod.shard_capture(cap, m)
    dec_pp = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    dec_dma = decode_sharded.build_sharded_decoder(
        cfg, m, iq.shape[-1], halo_impl="pallas_dma"
    )
    got_pp = dec_pp(iq)
    got_dma = dec_dma(iq)

    assert int(got_dma.sync_index) == int(got_pp.sync_index) == int(
        ref.sync_index
    )
    np.testing.assert_array_equal(
        np.asarray(got_dma.rx_data), np.asarray(got_pp.rx_data)
    )
    np.testing.assert_array_equal(
        np.asarray(got_dma.rx_data), np.asarray(ref.rx_data)
    )
