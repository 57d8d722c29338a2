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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prev_r, prev_i, cur_r, cur_i, out_ref, *, M: int, B: int):
    M2 = M // 2
    # history = last M samples of the previous block
    hr = prev_r[0, B - M :]
    hi = prev_i[0, B - M :]
    xr = jnp.concatenate([hr, cur_r[0, :]])  # [B + M]
    xi = jnp.concatenate([hi, cur_i[0, :]])

    # lag-M2 product: prod[k] = conj(x[k - M2]) * x[k], k in [M2, B+M)
    ar = xr[:-M2]
    ai = xi[:-M2]
    br = xr[M2:]
    bi = xi[M2:]
    prod_r = ar * br + ai * bi          # [B + M - M2]
    prod_i = ar * bi - ai * br

    # moving sums via chunk-local cumsum differences (2D for TPU)
    cr = jnp.cumsum(prod_r.reshape(1, -1), axis=-1)[0]
    ci = jnp.cumsum(prod_i.reshape(1, -1), axis=-1)[0]
    # corr at t (global k = t) for outputs k in [M, B+M):
    #   sum prod[k-M2+1 .. k] = c[k - M2] - c[k - M2 - M2]  in prod coords
    # prod index p corresponds to k = p + M2, so k in [M, B+M) ->
    # p_hi = k - M2 in [M2, B+M2), window M2 -> c[p_hi] - c[p_hi - M2]
    corr_r = cr[M2 : B + M2] - cr[: B]
    corr_i = ci[M2 : B + M2] - ci[: B]

    energy_in = xr * xr + xi * xi       # [B + M]
    ce = jnp.cumsum(energy_in.reshape(1, -1), axis=-1)[0]
    e = 0.5 * (ce[M : B + M] - ce[:B])

    metric = (corr_r * corr_r + corr_i * corr_i) / (e * e)
    out_ref[0, :] = metric


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

    prev_spec = pl.BlockSpec((1, B), lambda s, i: (s, i),
                             memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((1, B), lambda s, i: (s, i + 1),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, M=M, B=B),
        grid=(S, nb),
        in_specs=[prev_spec, prev_spec, cur_spec, cur_spec],
        out_specs=pl.BlockSpec((1, B), lambda s, i: (s, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nb * B), jnp.float32),
    )(xr, xi, xr, xi)
    return out[:, :T]
