"""Pallas TPU kernel: the ENTIRE sync stage in one pass over the capture.

The XLA sync path (sync.schmidl_cox.synchronize) makes ~8 full-capture
HBM round trips: delay pad, lag product, two chunked moving-sum stacks
(each a reduce-window cumsum), metric, plateau cummax, fire argmax —
measured at ~3 ms of the 15 ms full decode at the reference operating
point, against a ~90 us two-read roofline.  This kernel fuses everything
the decode needs from sync:

    metric[t]  = |moving_sum(conj(x[t-M/2]) x[t], M/2)|^2
                 / (0.5 moving_sum(|x|^2, M))^2          (framing.cc:626-637)
    plateau    : per-stream run tracking of metric > threshold, carried
                 across blocks (last-below cummax, framing.cc:601-623)
    election   : first sample where every stream's run exceeds cp_len;
                 captures t*, per-stream run starts, and the complex S&C
                 correlation at t* (the CFO observable)

into a single grid sweep with carried SMEM state: each step reads its
block (plus the previous block as an M-sample history halo), computes
chunk-local cumsum differences and a chunk-local cummax in VMEM, and
only ever writes a handful of scalars.  TPU grid steps execute
sequentially, so the carried last-below/flag state is exact — the result
REPLICATES the serial state machine, not an approximation of it.

Float caveat (same one documented for the chunked XLA path and the
sharded decode): chunk-local summation order differs from the XLA
blocks', so a metric sample within ~1 ulp of the threshold could tip a
run decision differently.  Never observed; the equality test drives both
paths over full captures.

Used by sync.schmidl_cox.synchronize on the TPU backend when the caller
does not need the full metric array; interpret mode covers CPU testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG1 = -1
_BIG = 2**30  # python int: jnp constants created at import get "captured"


def _scan_last(x: jax.Array, op, identity) -> jax.Array:
    """Inclusive scan along the last axis via Hillis-Steele shift-op:
    log2(N) full-width ops in VMEM (Mosaic has no scan primitive)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (k,), identity, dtype=x.dtype),
             x[..., : n - k]],
            axis=-1,
        )
        x = op(x, shifted)
        k *= 2
    return x


def _kernel(cur_r, cur_i,
            synced_ref, tstar_ref, starts_ref, corr_ref,
            lb_scr, flag_scr, hist_r, hist_i,
            *, M: int, B: int, S: int, cp: int, thr: float, T: int):
    M2 = M // 2
    i = pl.program_id(0)

    # ---- metric + corr for this block ----
    # The M-sample history halo is CARRIED in VMEM scratch across the
    # sequential grid steps (each block is read from HBM exactly once;
    # passing the array twice with shifted index maps made XLA insert
    # full-capture defensive copies for the duplicated operand).  The
    # input planes are unpadded: the last block may read past the array
    # edge, zero-masked here by global position; block 0's history is
    # zeroed explicitly.
    @pl.when(i == 0)
    def _zero_hist():
        hist_r[:, :] = jnp.zeros((S, M), jnp.float32)
        hist_i[:, :] = jnp.zeros((S, M), jnp.float32)

    ext_pos = i * B - M + jax.lax.broadcasted_iota(
        jnp.int32, (S, B + M), 1
    )
    inside = ext_pos < T  # history/left edge handled by the zero scratch
    xr = jnp.concatenate([hist_r[:, :], cur_r[:, :]], axis=-1)
    xi = jnp.concatenate([hist_i[:, :], cur_i[:, :]], axis=-1)
    xr = jnp.where(inside, xr, 0.0)
    xi = jnp.where(inside, xi, 0.0)
    # carry this block's tail as the next step's history (masked values:
    # the tail of the LAST block is never consumed)
    hist_r[:, :] = xr[:, B:]
    hist_i[:, :] = xi[:, B:]
    ar, ai = xr[:, :-M2], xi[:, :-M2]
    br, bi = xr[:, M2:], xi[:, M2:]
    prod_r = ar * br + ai * bi
    prod_i = ar * bi - ai * br
    cr = _scan_last(prod_r, jnp.add, 0.0)
    ci = _scan_last(prod_i, jnp.add, 0.0)
    # corr = -moving_sum(prod, M/2)  (the reference's -1.0 taps,
    # framing.cc:342 — squared away in the metric, kept for the CFO sign)
    corr_r = -(cr[:, M2: B + M2] - cr[:, :B])
    corr_i = -(ci[:, M2: B + M2] - ci[:, :B])
    ce = _scan_last(xr * xr + xi * xi, jnp.add, 0.0)
    energy = 0.5 * (ce[:, M: B + M] - ce[:, :B])
    metric = (corr_r * corr_r + corr_i * corr_i) / (energy * energy)

    # ---- plateau tracking with carried last-below state ----
    idx = i * B + jax.lax.broadcasted_iota(jnp.int32, (S, B), 1)
    above = metric > thr                      # NaN -> False, like C float
    masked = jnp.where(above, jnp.int32(_NEG1), idx)
    local_cm = _scan_last(masked, jnp.maximum, _NEG1)

    @pl.when(i == 0)
    def _init():
        for s in range(S):
            lb_scr[s] = jnp.int32(_NEG1)
        flag_scr[0] = jnp.int32(0)
        synced_ref[0] = jnp.int32(0)
        tstar_ref[0] = jnp.int32(0)

    carry = jnp.array([lb_scr[s] for s in range(S)], jnp.int32)  # [S]
    lb = jnp.maximum(local_cm, carry[:, None])
    run_start = lb + 1
    cond = above & ((idx - run_start) > cp)
    cond_all_i = jnp.min(cond.astype(jnp.int32), axis=0)  # [B] AND streams
    fire_idx = jnp.where(cond_all_i > 0, idx[0], jnp.int32(_BIG))
    t_blk = jnp.min(fire_idx)
    any_fire = t_blk < _BIG

    @pl.when(i == 0)
    def _defaults():
        # XLA plateau_scan semantics when nothing ever fires:
        # t*=0, starts=run_start[:,0], corr at t=0
        onehot0 = (idx == 0).astype(jnp.float32)
        for s in range(S):
            starts_ref[s] = jnp.sum(
                run_start[s] * onehot0[s].astype(jnp.int32)
            )
            corr_ref[s] = jnp.sum(corr_r[s] * onehot0[s])
            corr_ref[S + s] = jnp.sum(corr_i[s] * onehot0[s])

    flag = flag_scr[0]

    @pl.when((flag == 0) & any_fire)
    def _capture():
        onehot = (idx == t_blk).astype(jnp.float32)  # [S, B]
        for s in range(S):
            starts_ref[s] = jnp.sum(
                run_start[s] * onehot[s].astype(jnp.int32)
            )
            corr_ref[s] = jnp.sum(corr_r[s] * onehot[s])
            corr_ref[S + s] = jnp.sum(corr_i[s] * onehot[s])
        tstar_ref[0] = t_blk
        synced_ref[0] = jnp.int32(1)
        flag_scr[0] = jnp.int32(1)

    for s in range(S):
        lb_scr[s] = lb[s, B - 1]


@functools.partial(
    jax.jit,
    static_argnames=("M", "cp_len", "threshold", "block", "interpret"),
)
def sc_sync_fused(
    x: jax.Array,
    M: int,
    cp_len: int,
    threshold: float,
    block: int = 1 << 15,
    interpret: bool = False,
):
    """One-pass fused sync: x [S, T] complex64 ->
    (synced bool, t_star i32, starts i32[S], corr_at c64[S]).

    Semantics identical to sc_metric + plateau_scan + corr[:, t_star]
    (sync.schmidl_cox), modulo chunk-summation float rounding."""
    S, T = x.shape
    B = max(int(block), M)
    nb = -(-T // B)
    # no pad copies: the planes go in as-is; edge blocks read junk past
    # the array (allowed) and block 0's history halo comes from a clamped
    # index map — the kernel masks both by global position
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)

    cur_spec = pl.BlockSpec((S, B), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    synced, tstar, starts, corr = pl.pallas_call(
        functools.partial(
            _kernel, M=M, B=B, S=S, cp=int(cp_len), thr=float(threshold),
            T=T,
        ),
        grid=(nb,),
        in_specs=[cur_spec, cur_spec],
        out_specs=(
            smem((1,), lambda i: (0,)),
            smem((1,), lambda i: (0,)),
            smem((S,), lambda i: (0,)),
            smem((2 * S,), lambda i: (0,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
            jax.ShapeDtypeStruct((2 * S,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((S,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((S, M), jnp.float32),
            pltpu.VMEM((S, M), jnp.float32),
        ],
        interpret=(
            pltpu.InterpretParams(
                # edge blocks intentionally read past the array (masked
                # in-kernel by global position)
                out_of_bounds_reads="uninitialized",
                uninitialized_memory="zero",
            )
            if interpret else False
        ),
    )(xr, xi)
    corr_at = corr[:S] + 1j * corr[S:]
    return (
        synced[0] > 0,
        tstar[0],
        starts,
        corr_at.astype(jnp.complex64),
    )
