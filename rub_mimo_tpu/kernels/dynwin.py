"""Pallas TPU kernel: contiguous window copy at a dynamic sample offset.

The decode pipeline's payload / replay-window extraction is a plain
``x[:, start : start + length]`` with a TRACED start and windowcf
read-zeros semantics outside the capture (mimo/framing.cc:284, 639-651:
the reference's windowcf is a zero-initialized ring the state machine
replays from).  XLA has no fast lowering for that on TPU: ``jnp.pad`` +
``dynamic_slice`` (and ``jnp.roll``, which concatenates the array with
itself and dynamic-slices) become while loops carrying payload-sized
buffers — measured ~1.5 ms of the ~4 ms full decode for the 2x2.2M-
sample payload grab, against a two-pass-over-17-MB roofline of ~50 us.
Element-level gathers are worse (~30 ms, see pipeline.rx).

Kernel strategy (v2 — the v1 kernel shipped round 2's 70x regression,
BENCH_r02, by realigning each block with a dynamic ``pltpu.roll`` over a
3B-wide scratch, which Mosaic lowers to an O(lanes) shift chain;
~250 ms measured):

  - Mosaic requires dynamic DMA offsets on the lane dim to be provably
    128-aligned, so each grid step issues ONE aligned contiguous DMA of
    (B + 128) samples from the 128-aligned floor of its wanted start
    into VMEM scratch.
  - The residual shift r = start - aligned_start (in [0, 128)) is THE
    SAME for every block, and a dynamic intra-group shift is a matmul:
    out[g][j] = scratch[g*128 + j + r] is computed by pairing each
    128-lane group with its successor ([.., 256]) and multiplying by
    the dynamically-built 0/1 selection matrix S(r)[k, j] = (k == j+r)
    on the MXU.  B x 256 MACs per block — noise next to the DMA.
  - Out-of-capture positions are zero-masked in-kernel by global
    position (windowcf read-zeros semantics).

No carried state: the grid steps are independent, so block DMAs
pipeline behind the matmuls.  Complex captures ride through as bit-cast
interleaved float32 pairs ([S, T] c64 -> [S, 2T] f32, offsets doubled),
so the same kernel body serves both dtypes with no plane splits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(off_ref, x_ref, out_ref, buf, sem, *, B: int, S: int,
            W: int):
    i = pl.program_id(0)
    s = off_ref[0] + i * B                   # wanted absolute start
    # aligned DMA start; the ceil'd upper clamp keeps it a multiple of
    # 128 while still covering the array's unaligned tail.
    # LAYOUT DEPENDENCY (no API guarantee): the fetch may run up to 127
    # lanes past W, into the minor-dim tile padding every XLA:TPU f32
    # allocation carries (last dim physically padded to a 128-lane
    # multiple); those lanes are position-masked below.  A future
    # linear-HBM layout would make this a real OOB read.
    wc = -(-W // 128) * 128                  # ceil128(W) == physical top
    hi = max(wc - B - 128, 0)
    sa = pl.multiple_of(jnp.clip((s // 128) * 128, 0, hi), 128)
    d = s - sa
    # ONE aligned contiguous DMA of B+128 samples into the data region
    # buf[B : 2B+128) (the [0, B) region is never read at an in-range
    # position — junk there is masked).  Coverage proof: any in-range
    # output position p = s + j (0 <= p < W) has buf index
    # B + p - sa < B + W - sa <= B + W - (wc - B - 128) <= 2B + 128,
    # and p >= sa whenever the fast path below applies or p >= 0 with
    # sa = 0, so every in-range read lands inside the DMA'd region.
    cp = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(sa, B + 128)], buf.at[:, B: 2 * B + 128], sem
    )
    cp.start()
    cp.wait()

    j = s + jax.lax.broadcasted_iota(jnp.int32, (S, B), 1)
    in_range = (j >= 0) & (j < W)
    fast = (d >= 0) & (d < 128)

    # FAST path — every block whose aligned floor was not clamped, i.e.
    # all of them except (at most) one pre-start and one straddling-the-
    # end block per call: the residual shift d = s mod 128 is the same
    # for the whole call.  A dynamic intra-group shift is a matmul:
    # output group g reads buf lanes [B + g*128 + d, B + g*128 + 128 +
    # d), so pair each 128-lane group with its successor and select
    # with the dynamically built 0/1 matrix sel[k, j] = (k == j + d) on
    # the MXU.  B x 256 exact {0,1}-products per block — noise next to
    # the DMA.  (The v1 kernel realigned with a dynamic pltpu.roll over
    # a 3B-wide scratch instead — an O(lanes) shift chain that made the
    # whole decode 70x slower, BENCH_r02.)
    @pl.when(fast)
    def _fast():
        kk = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
        sel = (kk == jj + d).astype(jnp.float32)
        g1 = buf[:, B: 2 * B].reshape(S * (B // 128), 128)
        g2 = buf[:, B + 128: 2 * B + 128].reshape(S * (B // 128), 128)
        pair = jnp.concatenate([g1, g2], axis=-1)      # [S*B/128, 256]
        val = jax.lax.dot(
            pair, sel, preferred_element_type=jnp.float32
        ).reshape(S, B)
        out_ref[:, :] = jnp.where(in_range, val, 0.0)

    # SLOW path — the clamped edge blocks (d < 0: window starts before
    # the capture; d >= 128: window straddles/overruns the end).  A
    # barrel shifter over the full buffer handles any shift u = B + d
    # in [0, 2B+128): log2 stages of static-slice-and-select, widths
    # shrinking as high bits resolve.  Runs for <= 2 blocks per call.
    @pl.when(jnp.logical_not(fast))
    def _slow():
        u = jnp.clip(B + d, 0, 2 * B + 127)
        y = buf[:, :]                                  # [S, 2B+128]
        width = 2 * B + 128
        K = (2 * B + 127).bit_length()
        for k in range(K - 1, -1, -1):
            sh = 1 << k
            if sh >= width:
                continue
            bit = ((u >> k) & 1) > 0
            shifted = jnp.concatenate(
                [y[:, sh:], jnp.zeros((S, sh), jnp.float32)], axis=-1
            )
            y = jnp.where(bit, shifted, y)
            new_w = min(width, B + sh)  # lanes >= B + 2^k never needed
            y = y[:, :new_w]
            width = new_w
        out_ref[:, :] = jnp.where(in_range, y[:, :B], 0.0)


@functools.partial(
    jax.jit, static_argnames=("length", "block", "interpret")
)
def dynamic_window(
    x: jax.Array,
    start: jax.Array,
    length: int,
    *,
    block: int = 1 << 17,
    interpret: bool = False,
) -> jax.Array:
    """``x[:, start : start + length]`` with zeros outside ``[0, T)``.

    x: [S, T] complex64 or float32; start: traced int32 (may be negative
    or run past the end — out-of-range positions read zero, matching the
    reference windowcf's zero-initialized backing store).
    """
    S, T = x.shape
    if block % 128:
        # the whole scheme (sa alignment, the 128-lane group pairing)
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
            pltpu.VMEM((S, 2 * B + 128), jnp.float32),
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
