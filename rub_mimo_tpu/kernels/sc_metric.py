"""Pallas TPU kernel: fused Schmidl&Cox metric over the whole capture.

The XLA path (sync.schmidl_cox.sc_metric) materializes several full-length
intermediates in HBM (delayed copy, lag product, two chunked cumsums,
metric) — each a separate HBM round trip on a multi-million-sample
capture.  This kernel fuses the entire per-sample chain

    xd[t]   = x[t - M/2]
    prod[t] = conj(xd[t]) * x[t]
    corr[t] = moving_sum(prod, M/2)        (taps -1.0 squared away)
    e[t]    = 0.5 * moving_sum(|x|^2, M)
    metric  = |corr|^2 / e^2

into one pass: each grid step loads its block plus the previous block (the
M-sample history halo), computes chunk-local cumsum differences in VMEM,
and writes only the metric.  HBM traffic drops from ~6 full-array
round trips to (2x read + 1x write).

Complex input is carried as split re/im float32 planes (TPU-native layout;
complex64 is just an interleaved pair anyway).

Requires block >= M.  Grid: (streams, num_blocks); block b reads padded
blocks b and b+1 where the padding prepends one zero block — the zero
history matches liquid's zero-initialized filter state (framing.cc:381-388).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_last(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last axis via a Hillis-Steele shift-add
    scan (Mosaic has no cumsum primitive): log2(N) full-width adds in VMEM."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (k,), dtype=x.dtype), x[..., : n - k]],
            axis=-1,
        )
        x = x + shifted
        k *= 2
    return x


def _kernel(prev_r, prev_i, cur_r, cur_i, out_ref, *, M: int, B: int):
    M2 = M // 2
    # history = last M samples of the previous block; all streams at once
    # (TPU blocks must span the full sublane dim)
    xr = jnp.concatenate([prev_r[:, B - M :], cur_r[:, :]], axis=-1)  # [S, B+M]
    xi = jnp.concatenate([prev_i[:, B - M :], cur_i[:, :]], axis=-1)

    # lag-M2 product: prod[k] = conj(x[k - M2]) * x[k], k in [M2, B+M)
    ar = xr[:, :-M2]
    ai = xi[:, :-M2]
    br = xr[:, M2:]
    bi = xi[:, M2:]
    prod_r = ar * br + ai * bi          # [S, B + M - M2]
    prod_i = ar * bi - ai * br

    # moving sums via chunk-local cumsum differences
    cr = _cumsum_last(prod_r)
    ci = _cumsum_last(prod_i)
    # corr at t (global k = t) for outputs k in [M, B+M):
    #   sum prod[k-M2+1 .. k] in prod coords p = k - M2:
    #   c[p] - c[p - M2] for p in [M2, B+M2)
    corr_r = cr[:, M2 : B + M2] - cr[:, :B]
    corr_i = ci[:, M2 : B + M2] - ci[:, :B]

    energy_in = xr * xr + xi * xi       # [S, B + M]
    ce = _cumsum_last(energy_in)
    e = 0.5 * (ce[:, M : B + M] - ce[:, :B])

    metric = (corr_r * corr_r + corr_i * corr_i) / (e * e)
    out_ref[:, :] = metric


@functools.partial(jax.jit, static_argnames=("M", "block"))
def sc_metric_pallas(x: jax.Array, M: int, block: int = 1 << 15) -> jax.Array:
    """Fused S&C metric.  x: [S, T] complex64 -> metric [S, T] float32.

    Matches sync.schmidl_cox.sc_metric (without the corr output).
    """
    S, T = x.shape
    B = max(int(block), M)
    nb = -(-T // B)
    pad = nb * B - T
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    # prepend one zero block (history for block 0), pad tail to whole blocks
    xr = jnp.pad(xr, ((0, 0), (B, pad)))
    xi = jnp.pad(xi, ((0, 0), (B, pad)))

    prev_spec = pl.BlockSpec((S, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((S, B), lambda i: (0, i + 1),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, M=M, B=B),
        grid=(nb,),
        in_specs=[prev_spec, prev_spec, cur_spec, cur_spec],
        out_specs=pl.BlockSpec((S, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nb * B), jnp.float32),
    )(xr, xi, xr, xi)
    return out[:, :T]
