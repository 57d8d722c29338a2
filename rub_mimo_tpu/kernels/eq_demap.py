"""Equalize + hard-demap Pallas kernel in NATURAL subcarrier order.

The payload "eqdemap" impl: XLA keeps the batched FFT (its output is
already natural-order), and this kernel replaces the XLA tail after it —
the equalize+demap mega-fusion (0.48 ms at the reference operating
point, ~1.5x the VPU bound because XLA routes the scores through bf16
and a variadic argmax reduce) plus the moveaxis copies around it.

Everything here is elementwise over [frames, M] tiles: the per-
subcarrier constants broadcast along rows, so there are NO transposes,
packs, or lane-dim reshapes anywhere — the constructions this
toolchain's Mosaic backend cannot compile (see docs/BENCHMARKS.md
"Pallas compile findings").  Compare kernels/payload_fused.py, which
fuses the FFT too but pays an XLA epilogue relayout that cancels its
win.

Math (identical contraction order to detect/zf.py::equalize and
ofdm/constellation.py::demodulate, framing.cc:570-585):

    eq[out, f, sc] = (sum_j W[sc, out, j] * X[j, f, sc]) * gain[sc]
    data = argmax_k Re(eq) cr_k + Im(eq) ci_k - |c_k|^2 / 2
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def supported(M: int, m_occ: int, n_streams: int, arity: int) -> bool:
    if M != m_occ or M % 128:
        return False
    return 1 <= n_streams <= 4 and arity <= 64


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, g_ref,
            er_ref, ei_ref, d_ref, *, S, cr, ci, cb):
    g = g_ref[0]  # [1, M] broadcast over frames
    for out in range(S):
        ar = None
        ai = None
        for j in range(S):
            wr = wr_ref[out, j]  # [1, M]
            wi = wi_ref[out, j]
            xr = xr_ref[j]       # [F, M]
            xi = xi_ref[j]
            tr = wr * xr - wi * xi
            ti = wr * xi + wi * xr
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        ar = ar * g
        ai = ai * g

        best = jnp.full(ar.shape, -np.inf, jnp.float32)
        idx = jnp.zeros(ar.shape, jnp.int32)
        for k in range(len(cr)):
            sc = ar * cr[k] + ai * ci[k] - cb[k]
            take = sc > best
            best = jnp.where(take, sc, best)
            idx = jnp.where(take, k, idx)

        er_ref[out] = ar
        ei_ref[out] = ai
        d_ref[out] = idx


@functools.partial(
    jax.jit, static_argnames=("M", "S", "n_sym", "table", "interpret"))
def _eq_demap(xr, xi, wr, wi, g, *, M, S, n_sym, table, interpret):
    # frames per grid step: prefer a block size that divides n_sym so
    # the [S, n_sym, M] operands need no pad/slice (the 1000-frame
    # operating point padded to 1024 cost two ~16 MB pad passes)
    F = 32
    for cand in (40, 32, 24, 16, 8):
        if n_sym % cand == 0:
            F = cand
            break
    npad = -(-n_sym // F) * F
    if npad != n_sym:
        padw = ((0, 0), (0, npad - n_sym), (0, 0))
        xr = jnp.pad(xr, padw)
        xi = jnp.pad(xi, padw)
    t = np.asarray(table)
    cr = tuple(np.float32(v) for v in t.real)
    ci = tuple(np.float32(v) for v in t.imag)
    cb = tuple(np.float32(v) for v in (np.abs(t) ** 2 / 2.0))
    kern = functools.partial(_kernel, S=S, cr=cr, ci=ci, cb=cb)
    xspec = pl.BlockSpec((S, F, M), lambda i: (0, i, 0))
    wspec = pl.BlockSpec((S, S, 1, M), lambda i: (0, 0, 0, 0))
    gspec = pl.BlockSpec((1, M), lambda i: (0, 0))
    ospec = pl.BlockSpec((S, F, M), lambda i: (0, i, 0))
    er, ei, d = pl.pallas_call(
        kern,
        grid=(npad // F,),
        in_specs=[xspec, xspec, wspec, wspec, gspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((S, npad, M), jnp.float32),
            jax.ShapeDtypeStruct((S, npad, M), jnp.float32),
            jax.ShapeDtypeStruct((S, npad, M), jnp.int32),
        ],
        interpret=interpret,
    )(xr, xi, wr, wi, g)
    if npad != n_sym:
        er = er[:, :n_sym]
        ei = ei[:, :n_sym]
        d = d[:, :n_sym]
    return er, ei, d


def _demap_kernel(xr_ref, xi_ref, d_ref, *, S, cr, ci, cb):
    for s in range(S):
        ar = xr_ref[s]
        ai = xi_ref[s]
        best = jnp.full(ar.shape, -np.inf, jnp.float32)
        idx = jnp.zeros(ar.shape, jnp.int32)
        for k in range(len(cr)):
            sc = ar * cr[k] + ai * ci[k] - cb[k]
            take = sc > best
            best = jnp.where(take, sc, best)
            idx = jnp.where(take, k, idx)
        d_ref[s] = idx


@functools.partial(
    jax.jit, static_argnames=("m", "S", "n_sym", "table", "interpret"))
def _demap(xr, xi, *, m, S, n_sym, table, interpret):
    F = 32
    for cand in (40, 32, 24, 16, 8):
        if n_sym % cand == 0:
            F = cand
            break
    npad = -(-n_sym // F) * F
    if npad != n_sym:
        padw = ((0, 0), (0, npad - n_sym), (0, 0))
        xr = jnp.pad(xr, padw)
        xi = jnp.pad(xi, padw)
    t = np.asarray(table)
    cr = tuple(np.float32(v) for v in t.real)
    ci = tuple(np.float32(v) for v in t.imag)
    cb = tuple(np.float32(v) for v in (np.abs(t) ** 2 / 2.0))
    kern = functools.partial(_demap_kernel, S=S, cr=cr, ci=ci, cb=cb)
    spec = pl.BlockSpec((S, F, m), lambda i: (0, i, 0))
    d = pl.pallas_call(
        kern,
        grid=(npad // F,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((S, npad, m), jnp.int32),
        interpret=interpret,
    )(xr, xi)
    return d[:, :n_sym] if npad != n_sym else d


def demap_supported(m: int, arity: int) -> bool:
    return m % 128 == 0 and arity <= 64


def demap(Y: jax.Array, table: np.ndarray, interpret: bool = False):
    """Hard nearest-neighbour demap of [S, n_sym, m] complex symbols —
    the VPU analog of ofdm.constellation.demodulate (identical score
    formulation and first-max tie-break), without XLA's bf16-scored
    variadic argmax reduce.  Requires m % 128 == 0."""
    S, n_sym, m = Y.shape
    return _demap(
        jnp.real(Y).astype(jnp.float32), jnp.imag(Y).astype(jnp.float32),
        m=m, S=S, n_sym=n_sym,
        table=tuple(np.asarray(table).tolist()), interpret=interpret,
    )


def eq_demap(X: jax.Array, W: jax.Array, gain: jax.Array,
             table: np.ndarray, interpret: bool = False):
    """X: [S(rx), n_sym, M] frequency-domain payload (already scaled by
    the DFT normalizer).  W: [M, out, rx] c64, gain: [M] f32.
    Returns (rx_sig [S, n_sym*M] c64, rx_data [S, n_sym*M] i32)."""
    S, n_sym, M = X.shape
    xr = jnp.real(X).astype(jnp.float32)
    xi = jnp.imag(X).astype(jnp.float32)
    # [out, rx, 1, M] broadcast tiles in natural order
    Wt = jnp.transpose(W, (1, 2, 0))  # [out, rx, M]
    wr = jnp.real(Wt).astype(jnp.float32)[:, :, None, :]
    wi = jnp.imag(Wt).astype(jnp.float32)[:, :, None, :]
    g = gain.astype(jnp.float32)[None, :]
    er, ei, d = _eq_demap(
        xr, xi, wr, wi, g, M=M, S=S, n_sym=n_sym,
        table=tuple(np.asarray(table).tolist()), interpret=interpret,
    )
    rx_sig = jax.lax.complex(er, ei).reshape(S, n_sym * M)
    return rx_sig, d.reshape(S, n_sym * M)
