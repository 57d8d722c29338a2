"""Pallas inter-chip DMA halo exchange (SURVEY §2.5 last row, §7 step 7).

The time-sharded sync stage needs each shard's last (M-1) samples sent to
its RIGHT neighbor (an overlap-save halo for the S&C correlator).  The
default implementation is an XLA `ppermute` collective
(parallel/decode_sharded.py::_sync_stage); this module provides the
explicit-DMA variant using `pltpu.make_async_remote_copy`, the primitive
that lets a hand-written kernel overlap ICI transfers with compute (the
pattern the reference's UHD/pthread pipeline has no analog for — its only
"comm stack" is a pthread condvar, mimo/main.cc:84-90).

The kernel is a symmetric SPMD ring shift: every device starts one RDMA
of its local buffer to the next device along the mesh axis and waits on
its own receive semaphore (signalled by the LEFT neighbor's copy).  The
wrap-around copy into device 0 is masked to zeros outside the kernel so
the result is bit-identical to the non-circular `ppermute` shift (which
zero-fills absent peers).

Complex samples travel as their float32 real/imag planes: Pallas TPU has
no complex dtype, and a [S, 2, H] float32 layout is what the DMA engine
moves either way.

Validated in Pallas TPU *interpret mode* on the virtual CPU mesh against
the ppermute path (tests/test_halo_dma.py) — interpret mode simulates the
inter-device DMAs + semaphores, so the kernel's logic is exercised
without multi-chip hardware.  On a real multi-chip mesh the same code
compiles with `interpret=False`; enable via
build_sharded_decoder(..., halo_impl="pallas_dma").
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(right_ref, src_ref, dst_ref, send_sem, recv_sem, *,
                  axis_name: str):
    """Ring-shift one block to the right neighbor along `axis_name`.

    The neighbor's coordinate arrives as an SMEM scalar (computed outside
    the kernel with ordinary shard_map ops).  MESH addressing names only
    the communication axis; coordinates on the other mesh axes are
    implicitly "same as sender"."""
    rdma = pltpu.make_async_remote_copy(
        src_ref=src_ref,
        dst_ref=dst_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id={axis_name: right_ref[0]},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    rdma.start()
    # wait() releases when our outbound copy completed AND our own
    # dst_ref received the left neighbor's copy (symmetric SPMD ring).
    rdma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("axis_name", "mesh_axes", "n_dev", "interpret"),
)
def ring_shift_right(
    x: jax.Array,
    *,
    axis_name: str,
    mesh_axes: tuple,
    n_dev: int,
    interpret: bool = False,
) -> jax.Array:
    """Inside shard_map: return the LEFT neighbor's `x` (complex64
    [S, H]); device 0 gets zeros.  Equivalent to
    ``jax.lax.ppermute(x, axis_name, [(j, j+1) for j in range(n-1)])``
    but implemented as an explicit Pallas remote-DMA kernel."""
    if n_dev == 1:
        return jnp.zeros_like(x)
    planes = jnp.stack([jnp.real(x), jnp.imag(x)], axis=1)  # [S, 2, H] f32
    planes = planes.astype(jnp.float32)
    me = jax.lax.axis_index(axis_name)
    right = ((me + 1) % n_dev).astype(jnp.int32).reshape(1)
    recv = pl.pallas_call(
        functools.partial(_shift_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct(
            planes.shape, planes.dtype,
            vma=getattr(jax.typeof(planes), "vma", None),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(right, planes)
    recv = jnp.where(me == 0, jnp.zeros_like(recv), recv)
    return (recv[:, 0, :] + 1j * recv[:, 1, :]).astype(x.dtype)
