"""Pallas TPU kernel: CP-strip + symbol split of the flat payload.

The decode's payload demodulation needs ``x_t[s, k, :] =
payload[s, k*symbol_len + cp_len : (k+1)*symbol_len]`` (the reference
strips the cyclic prefix per received symbol, mimo/framing.cc:558).  The
obvious XLA formulation — ``payload.reshape(S, n_sym, symbol_len)[:, :,
cp_len:]`` — forces a tiled-layout change (symbol_len is not a multiple
of the 128-lane tile), which XLA:TPU lowers to per-stream while loops
carrying payload-sized buffers plus dynamic-update-slice chains:
~1 ms of the ~3 ms full decode at the reference operating point, against
a two-pass-over-35-MB roofline of ~90 us.

Here the split is a grid of block copies with fully STATIC offsets (the
dynamic payload start was already resolved by the contiguous
dynamic-slice in pipeline.rx.extract_payload, which XLA handles well):
each grid step's input block is ``block_syms`` whole symbols of the flat
payload, and the kernel body peels each symbol's post-CP span with a
static unaligned VMEM slice (a lane shift in Mosaic — no DMA, no MXU).
BlockSpec pipelining overlaps the HBM reads/writes with the shifts.

Complex payloads ride through as bit-cast interleaved float32 pairs
([S, P] c64 -> [S, 2P] f32, spans doubled), so one kernel body serves
both dtypes.  The kernel is a pure copy: outputs are bit-identical to
the XLA reshape+slice formulation (asserted on the attached backend by
``bench.py --check``, which also times both — the "auto" dispatch in
pipeline.rx only routes here on measurement).

MEASURED RESULT (v5e, bench.py --check): equal=True but 244 ms inside
the full decode vs 4.6 ms for the XLA reshape.  Root cause (isolated by
a standalone probe): NOT the kernel body — the c64 <-> interleaved-f32
``.view()`` conversions at its boundary.  This backend stores complex64
as SPLIT re/im planes (X64Split custom calls at jit boundaries), so the
"free bitcast" view is actually a full scalarized interleave, ~240 ms
alone at the operating point.  The same conversion sits inside
kernels.dynwin, which retroactively explains BENCH_r02's 250 ms dynwin
measurement.  The fast path is pipeline.rx.strip_cp impl "xla128":
per-plane tile-aligned reshape + static lane-offset slices, no views,
~6x less device time than the plain reshape.  The auto dispatch never
routes here; the kernel is kept as the measured record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref, *, B: int, pitch: int, drop: int, keep: int):
    for b in range(B):
        s = b * pitch + drop
        o_ref[:, b, :] = x_ref[:, s : s + keep]


@functools.partial(
    jax.jit,
    static_argnames=("n_sym", "symbol_len", "cp_len", "block_syms",
                     "interpret"),
)
def cp_strip(
    payload: jax.Array,
    n_sym: int,
    symbol_len: int,
    cp_len: int,
    *,
    block_syms: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """``payload[:, :n_sym*symbol_len].reshape(S, n_sym, symbol_len)
    [:, :, cp_len:]`` as one pipelined Pallas pass.

    payload: [S, >= n_sym*symbol_len] complex64 or float32.
    Returns [S, n_sym, symbol_len - cp_len] in payload's dtype.
    """
    S = payload.shape[0]
    M = symbol_len - cp_len
    is_complex = jnp.issubdtype(payload.dtype, jnp.complexfloating)
    if is_complex:
        xf = payload.astype(jnp.complex64).view(jnp.float32)  # [S, 2P]
        pitch, drop, keep = 2 * symbol_len, 2 * cp_len, 2 * M
    else:
        xf = payload.astype(jnp.float32)
        pitch, drop, keep = symbol_len, cp_len, M

    B = max(1, min(int(block_syms), n_sym))
    nb = -(-n_sym // B)
    need = nb * B * pitch
    if xf.shape[1] < need:
        xf = jnp.pad(xf, ((0, 0), (0, need - xf.shape[1])))
    elif xf.shape[1] > need:
        xf = xf[:, :need]

    out = pl.pallas_call(
        functools.partial(_kernel, B=B, pitch=pitch, drop=drop, keep=keep),
        grid=(nb,),
        in_specs=[pl.BlockSpec((S, B * pitch), lambda i: (0, i))],
        out_specs=pl.BlockSpec((S, B, keep), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, nb * B, keep), jnp.float32),
        interpret=interpret,
    )(xf)
    out = out[:, :n_sym]
    if is_complex:
        out = out.view(jnp.complex64)  # [S, n_sym, M]
    return out
