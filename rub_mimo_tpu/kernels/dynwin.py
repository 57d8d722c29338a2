"""Pallas TPU kernel: contiguous window copy at a dynamic sample offset.

The decode pipeline's payload / replay-window extraction is a plain
``x[:, start : start + length]`` with a TRACED start and windowcf
read-zeros semantics outside the capture (mimo/framing.cc:284, 639-651:
the reference's windowcf is a zero-initialized ring the state machine
replays from).  XLA has no fast lowering for that on TPU: ``jnp.pad`` +
``dynamic_slice`` (and ``jnp.roll``, which concatenates the array with
itself and dynamic-slices) both become while loops carrying
payload-sized buffers — measured ~1.5 ms of the 4 ms full decode for
the 2x2.2M-sample payload grab, against a two-pass-over-17-MB roofline
of ~90 us.  Element-level gathers are worse (~30 ms, see pipeline.rx).

This kernel does it the way the hardware wants: a sequential grid over
output blocks, each step issuing ONE strided DMA from the capture in
ANY/HBM space at the scalar-prefetched element offset into VMEM
scratch, then a dynamic in-VMEM shift (``pl.ds`` load) to fix the
sub-block remainder, with out-of-capture positions zero-masked
in-kernel.  One read + one write per element at DMA bandwidth.

Complex captures ride through as bit-cast interleaved float32 pairs
([S, T] c64 -> [S, 2T] f32, offsets doubled), so the same kernel body
serves both dtypes with no plane splits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(off_ref, x_ref, out_ref, scratch, sem, *, B: int, S: int,
            W: int):
    # Mosaic requires BOTH dynamic DMA offsets and dynamic vector-load
    # offsets on the lane dim to be provably 128-aligned, so: DMA a
    # (B + 128)-sample superset from the 128-aligned floor of the wanted
    # start, then realign with a dynamic lane rotate (pltpu.roll — the
    # one lane-dim op that takes an arbitrary dynamic amount).
    i = pl.program_id(0)
    s = off_ref[0] + i * B                   # wanted absolute start
    # aligned DMA start; the ceil'd upper clamp keeps it a multiple of
    # 128 while still covering the array's unaligned tail — the fetch may
    # then run up to 127 lanes past W, into the minor-dim tile padding
    # every TPU allocation carries (those lanes are position-masked below)
    # LAYOUT DEPENDENCY (no API guarantee): this relies on XLA:TPU's
    # tiled minor-dim padding — every f32 allocation's last dim is
    # physically padded to a multiple of the 128-lane tile, so a DMA
    # ending <=127 lanes past the logical end stays inside the buffer.
    # A future linear-HBM layout would make this a real OOB read; if
    # Mosaic ever exposes a queried layout, derive `hi` from it instead.
    hi = max(-(-(W - B - 128) // 128) * 128, 0)
    sa = pl.multiple_of(jnp.clip((s // 128) * 128, 0, hi), 128)
    d = jnp.clip(s - sa, -B, B + 128)        # residual shift

    cp = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(sa, B + 128)], scratch.at[:, B: 2 * B + 128], sem
    )
    cp.start()
    cp.wait()
    # wanted window = scratch[B + d : 2B + d]; roll right by
    # (3B + 128) - (B + d) puts scratch[B + d] at lane 0.  The scratch's
    # outer regions are never written: any position they leak into is
    # outside [0, W) and zero-masked below.
    rolled = pltpu.roll(scratch[:, :], 2 * B + 128 - d, axis=1)
    val = rolled[:, :B]
    j = s + jax.lax.broadcasted_iota(jnp.int32, (S, B), 1)
    out_ref[:, :] = jnp.where((j >= 0) & (j < W), val, 0.0)


@functools.partial(
    jax.jit, static_argnames=("length", "block", "interpret")
)
def dynamic_window(
    x: jax.Array,
    start: jax.Array,
    length: int,
    *,
    block: int = 1 << 16,
    interpret: bool = False,
) -> jax.Array:
    """``x[:, start : start + length]`` with zeros outside ``[0, T)``.

    x: [S, T] complex64 or float32; start: traced int32 (may be negative
    or run past the end — out-of-range positions read zero, matching the
    reference windowcf's zero-initialized backing store).
    """
    S, T = x.shape
    if block % 128:
        # the whole scheme (sa alignment, the static scratch offset B)
        # assumes lane-dim 128-alignment; a stray block size would
        # miscompile in Mosaic rather than error cleanly
        raise ValueError(f"block must be a multiple of 128, got {block}")
    is_complex = jnp.issubdtype(x.dtype, jnp.complexfloating)
    if is_complex:
        xf = x.astype(jnp.complex64).view(jnp.float32)  # [S, 2T] interleaved
        off = 2 * jnp.asarray(start).astype(jnp.int32)
        W, L = 2 * T, 2 * length
    else:
        xf = x.astype(jnp.float32)
        off = jnp.asarray(start).astype(jnp.int32)
        W, L = T, length
    # B multiple of 128, and B + 128 <= W so the aligned DMA always fits
    B = min(int(block), ((W - 128) // 128) * 128)
    if B < 128:  # capture too small for the DMA scheme: plain XLA path
        k = jnp.arange(length, dtype=jnp.int32)[None, :] + jnp.asarray(
            start
        ).astype(jnp.int32)
        padded = jnp.pad(x, ((0, 0), (0, 1)))
        return jnp.where(
            (k >= 0) & (k < T), padded[:, jnp.clip(k[0], 0, T)], 0
        ).astype(x.dtype)

    nb = -(-L // B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (S, B), lambda i, off: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S, 3 * B + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, B=B, S=S, W=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        interpret=(
            pltpu.InterpretParams(
                # the tail DMA intentionally reads into tile padding
                out_of_bounds_reads="uninitialized",
                uninitialized_memory="zero",
            )
            if interpret else False
        ),
    )(off.reshape(1), xf)
    if is_complex:
        out = out.view(jnp.complex64)  # [S, length]
    return out
