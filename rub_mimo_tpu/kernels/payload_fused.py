"""Fused payload tail: per-symbol FFT + ZF/MMSE equalize + hard demap in
ONE Pallas kernel.

Replaces the XLA tail of the decode (batched ``jnp.fft.fft`` + the
unrolled equalize + the matmul/argmax demap — pipeline/rx.py payload
stage; reference per-sample loop framing.cc:535-589) whose XLA lowering
spends most of its time on layout copies: the round-4 profiler trace
attributed ~0.87 ms to the FFT's internal mixed-radix relayouts, 0.48 ms
to the equalize+demap fusion, and ~0.15 ms to the transposes between
them, at the reference operating point (M=2048, 2 streams, 1000 frames).
This kernel performs the same math tiled through VMEM so intermediates
never touch HBM.

Dataflow (per grid step, F = PACK*Q frames, all shapes 128-aligned —
this toolchain's Mosaic backend crashes on ANY lane-unaligned slice, see
docs/BENCHMARKS.md "Pallas compile findings"):

  N = M = N1*128 subcarriers, PACK = 128//N1 frames packed per row group.

  1. pack   R[(PACK*n1 + c), (128 q + n2)] = x[f=PACK*q+c][128 n1 + n2]
            (sublane-only permutation of the input block)
  2. stage1 A = (W_N1 (x) I_PACK) @ R      -- one full-width [128,128]
            MXU matmul per re/im plane: PACK independent N1-point DFTs
            ride the systolic array simultaneously
  3. twiddle B = A * T,  T[(PACK*k1+c), n2] = exp(-2j pi k1 n2 / N)
  4. stage2 C[:, 128q+k2] = sum_n2 B[:, 128q+n2] W128[n2, k2]
            -- [128,128] MXU matmuls, full utilization
            => C[(PACK*k1+c), (128 q+k2)] = X_{f}[k1 + N1*k2] * dft_norm
  5. equalize  eq[out] = (sum_j W[sc,out,j] C[j]) * gain[sc]  with the
            per-subcarrier constants pre-packed into [128,128] tiles
            (framing.cc:570-585 algebra, identical contraction order to
            detect/zf.py::equalize)
  6. demap  32-way nearest-neighbour argmax on the VPU
            (argmax_k Re(y)Re(c_k) + Im(y)Im(c_k) - |c_k|^2/2)
  7. unpack + per-frame [k2,k1] transpose -> natural subcarrier order,
            written as [S, F, M] blocks of rx_sig (planes) and rx_data.

Used by pipeline/rx.decode via the "payload" dispatch point when the
geometry gate holds (see ``supported``); measured + equality-gated by
``bench.py --check`` like every other dispatched impl.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(M: int, m_occ: int, n_streams: int, arity: int) -> bool:
    """Geometry gate for the fused kernel."""
    if M != m_occ or M % 128:
        return False
    n1 = M // 128
    if n1 not in (4, 8, 16, 32):
        return False
    if n_streams < 1 or n_streams > 4:
        return False
    return arity <= 64


def packed_perm(M: int) -> np.ndarray:
    """Static subcarrier permutation of the ``packed=True`` output
    layout: natural = packed[..., perm] with
    perm[sc] = 128*(sc % N1) + sc // N1.

    The packed layout is the kernel's own [c, k1, k2] tile order
    flattened as sc' = 128*k1 + k2 (k1 = sc mod N1 from the first DFT
    stage, k2 = sc div N1 from the second) — the order the FFT
    *produces*; emitting it directly removes the epilogue relayout that
    made the fused kernel tie in round 4 (docs/BENCHMARKS.md).  Scoring
    and any natural-order consumer apply this (tiny, static) gather —
    SER/BER/EVM are permutation-invariant, so the hot serving path
    never pays a relayout."""
    n1d = M // 128
    sc = np.arange(M)
    return (128 * (sc % n1d) + sc // n1d).astype(np.int32)


def _consts(M: int):
    n1d = M // 128
    pack = 128 // n1d
    i = np.arange(n1d)
    W16 = np.exp(-2j * np.pi * np.outer(i, i) / n1d)
    n2 = np.arange(128)
    W128 = np.exp(-2j * np.pi * np.outer(n2, n2) / 128)
    TW = np.exp(-2j * np.pi * np.outer(i, n2) / M)  # [k1, n2]
    L = np.zeros((128, 128), np.complex64)
    for a in range(n1d):
        for b in range(n1d):
            for c in range(pack):
                L[pack * a + c, pack * b + c] = W16[b, a]
    T = np.repeat(TW, pack, axis=0)  # [128, 128]
    return (
        L.real.astype(np.float32), L.imag.astype(np.float32),
        T.real.astype(np.float32), T.imag.astype(np.float32),
        W128.real.astype(np.float32), W128.imag.astype(np.float32),
    )


def pack_tile(v: np.ndarray | jax.Array, M: int):
    """Natural per-subcarrier vector [M] -> packed [128,128] tile:
    tile[(PACK*k1 + c), k2] = v[k1 + N1*k2] (c-replicated)."""
    n1d = M // 128
    pack = 128 // n1d
    V = jnp.transpose(jnp.reshape(v, (128, n1d)), (1, 0))  # [k1, k2]
    return jnp.repeat(V, pack, axis=0)


def _fft_eq_demap(Rr_in, Ri_in, wr_ref, wi_ref, gt, f_ref,
                  S, cr, ci, cb):
    """The shared per-group compute: packed-MXU FFT + equalize + demap on
    one PACK-frame tile group.  Rr_in/Ri_in: per-stream [128,128] packed
    input tiles (rows pack*n1 + c).  Returns per output stream
    (ar, ai, idx) [128,128] tiles in the same packed row order.  Kept
    bit-identical between the pre-stripped kernel (_kernel) and the
    strip-fused kernel (_kernel_strip): same contraction order."""
    # FFT constants stacked in one [6,128,128] input: L, T, W128 planes
    Lr_ = f_ref[0]
    Li_ = f_ref[1]
    Ttr = f_ref[2]
    Tti = f_ref[3]
    Vr_ = f_ref[4]
    Vi_ = f_ref[5]

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- FFT per rx stream ----
    Cr = []
    Ci = []
    for s in range(S):
        Rr = Rr_in[s]
        Ri = Ri_in[s]
        Ar = mm(Lr_, Rr) - mm(Li_, Ri)
        Ai = mm(Lr_, Ri) + mm(Li_, Rr)
        Br = Ar * Ttr - Ai * Tti
        Bi = Ar * Tti + Ai * Ttr
        Cr.append(mm(Br, Vr_) - mm(Bi, Vi_))
        Ci.append(mm(Br, Vi_) + mm(Bi, Vr_))

    # ---- equalize + demap per output stream ----
    outs = []
    for out in range(S):
        ar = jnp.zeros((128, 128), jnp.float32)
        ai = jnp.zeros((128, 128), jnp.float32)
        for j in range(S):
            wr = wr_ref[out, j]
            wi = wi_ref[out, j]
            ar = ar + (wr * Cr[j] - wi * Ci[j])
            ai = ai + (wr * Ci[j] + wi * Cr[j])
        ar = ar * gt
        ai = ai * gt

        best = jnp.full((128, 128), -np.inf, jnp.float32)
        idx = jnp.zeros((128, 128), jnp.int32)
        for k in range(len(cr)):
            sc = ar * cr[k] + ai * ci[k] - cb[k]
            take = sc > best
            best = jnp.where(take, sc, best)
            idx = jnp.where(take, k, idx)
        outs.append((ar, ai, idx))
    return outs


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, g_ref, f_ref,
            *out_refs, S, M, cr, ci, cb, packed, emit_sig):
    if emit_sig:
        er_ref, ei_ref, d_ref = out_refs
    else:
        (d_ref,) = out_refs
        er_ref = ei_ref = None
    """One grid step processes PACK frames: every tensor is a [128,128]
    f32 tile — no lane-dim splits/merges, no tiles/concats (this
    toolchain's Mosaic either crashes (HTTP 500) or compiles for
    minutes on those; clean tile ops compile in seconds)."""
    n1d = M // 128
    pack = 128 // n1d

    def pack_in(x):  # [pack, M] -> [128, 128] rows (pack*n1 + c)
        x3 = x.reshape(pack, n1d, 128)
        return jnp.transpose(x3, (1, 0, 2)).reshape(128, 128)

    Rr = [pack_in(xr_ref[s]) for s in range(S)]
    Ri = [pack_in(xi_ref[s]) for s in range(S)]
    outs = _fft_eq_demap(Rr, Ri, wr_ref, wi_ref, g_ref[...], f_ref,
                         S, cr, ci, cb)

    for out in range(S):
        ar, ai, idx = outs[out]
        if packed:
            # frame-major [c(frame), k1, k2] via an in-kernel sublane
            # transpose (legal in Mosaic; probed) — the [S, npad, n1d,
            # 128] output then reshapes FREE to [S, npad, M'] with
            # sc' = 128*k1 + k2, the ``packed_perm`` layout.  No XLA
            # epilogue relayout at all: this is what lets the fused
            # kernel's 0.207 ms replace ~1.4 ms of XLA payload math
            # instead of tying (round 5; VERDICT r4 item 1 route (a)).
            if emit_sig:
                er_ref[out] = jnp.transpose(ar.reshape(n1d, pack, 128),
                                            (1, 0, 2))
                ei_ref[out] = jnp.transpose(ai.reshape(n1d, pack, 128),
                                            (1, 0, 2))
            # int32 decisions written directly: the extra HBM bytes
            # hide under the kernel's compute, while the separate
            # int8->int32 convert pass was ~25 us SERIALIZED after it
            d_ref[out] = jnp.transpose(
                idx.reshape(n1d, pack, 128), (1, 0, 2))
        else:
            # outputs in k1-major layout [k1, c(frame), k2] — a pure row
            # split of the packed [(pack*k1 + c), k2] tile (legal in
            # Mosaic, unlike lane-dim merges); XLA's epilogue transpose
            # (0,2,3,1)+reshape to natural subcarrier order is then free
            # (measured at baseline cost, vs ~0.3 ms/array for unpacking
            # a row-packed 2D layout)
            er_ref[out] = ar.reshape(n1d, pack, 128)
            ei_ref[out] = ai.reshape(n1d, pack, 128)
            d_ref[out] = idx.astype(jnp.int8).reshape(n1d, pack, 128)


@functools.partial(
    jax.jit,
    static_argnames=("M", "S", "n_sym", "table", "interpret", "packed",
                     "emit_sig"),
)
def _payload_fused(xr, xi, wtr, wti, gtile, *, M, S, n_sym, table,
                   interpret, packed=False, emit_sig=True):
    n1d = M // 128
    pack = 128 // n1d
    # one grid step per PACK frames; pad n_sym to a multiple of PACK
    npad = -(-n_sym // pack) * pack
    if npad != n_sym:
        padw = ((0, 0), (0, npad - n_sym), (0, 0))
        xr = jnp.pad(xr, padw)
        xi = jnp.pad(xi, padw)
    nstep = npad // pack

    t = np.asarray(table)
    cr = tuple(np.float32(v) for v in t.real)
    ci = tuple(np.float32(v) for v in t.imag)
    cb = tuple(np.float32(v) for v in (np.abs(t) ** 2 / 2.0))
    fft_consts = jnp.asarray(np.stack(_consts(M)))  # [6, 128, 128]

    kern = functools.partial(_kernel, S=S, M=M, cr=cr, ci=ci, cb=cb,
                             packed=packed, emit_sig=emit_sig)
    xspec = pl.BlockSpec((S, pack, M), lambda i: (0, i, 0))
    wspec = pl.BlockSpec((S, S, 128, 128), lambda i: (0, 0, 0, 0))
    gspec = pl.BlockSpec((128, 128), lambda i: (0, 0))
    fspec = pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0))
    if packed:
        ospec = pl.BlockSpec((S, pack, n1d, 128), lambda i: (0, i, 0, 0))
        oshape = (S, npad, n1d, 128)
    else:
        ospec = pl.BlockSpec((S, n1d, pack, 128), lambda i: (0, 0, i, 0))
        oshape = (S, n1d, npad, 128)
    # under shard_map the outputs inherit the input's varying-mesh-axes
    # type (vma); None outside (plain jit)
    vma = getattr(jax.typeof(xr), "vma", None)

    def _st(dt):
        return jax.ShapeDtypeStruct(oshape, dt, vma=vma)

    sig_specs = [ospec, ospec] if emit_sig else []
    sig_shapes = [_st(jnp.float32)] * 2 if emit_sig else []
    outs = pl.pallas_call(
        kern,
        grid=(nstep,),
        in_specs=[xspec, xspec, wspec, wspec, gspec, fspec],
        out_specs=sig_specs + [ospec],
        out_shape=sig_shapes + [_st(jnp.int32 if packed else jnp.int8)],
        interpret=interpret,
    )(xr, xi, wtr, wti, gtile, fft_consts)
    if emit_sig:
        er, ei, d = outs
    else:
        (d,) = outs
        er = ei = None

    if packed:
        # frame-major [S, f, k1, k2]: the flatten to [S, npad, M'] is a
        # plain row-major view (sc' = 128*k1 + k2 — the packed_perm
        # layout), so NOTHING here moves data
        def unpack(t):
            return t.reshape(S, npad, M)
    else:
        def unpack(t):
            # k1-major [S, k1, f, k2] -> natural [S, npad, M],
            # sc = n1d*k2+k1
            return jnp.transpose(t, (0, 2, 3, 1)).reshape(S, npad, M)

    # combine the planes BEFORE the relayout: one c64 transpose instead
    # of two f32 ones; in the non-packed path the demap indices ride the
    # relayout as int8 (4x less HBM traffic) and widen to the API int32
    # afterwards — the packed path has no relayout, so the kernel wrote
    # int32 directly
    # packed: unpack is a FREE plane bitcast — do it before the complex
    # combine (reshaping the combined c64 was a measured ~25 us copy).
    # non-packed: unpack is a real transpose — combine FIRST so it rides
    # one c64 transpose instead of two f32 ones.
    if emit_sig:
        sig = (jax.lax.complex(unpack(er), unpack(ei)) if packed
               else unpack(jax.lax.complex(er, ei)))
    else:
        sig = None
    d = unpack(d) if packed else unpack(d).astype(jnp.int32)
    if npad != n_sym:
        sig = sig[:, :n_sym] if emit_sig else None
        d = d[:, :n_sym]
    return sig, d


def payload_fused(x_t: jax.Array, W: jax.Array, gain: jax.Array,
                  table: np.ndarray, dft_norm: float,
                  interpret: bool = False, packed: bool = False,
                  emit_sig: bool = True):
    """x_t: [S, n_sym, M] complex64 CP-stripped payload symbols.
    W: [M, out, rx] complex64, gain: [M] float32 (all-occupied geometry).
    table: constellation points (numpy, static).

    Returns (rx_sig complex64, rx_data int32) — [S, n_sym*M] in natural
    order by default — matching
    eq = (sum_j W[sc,out,j] X[j,sc]) * gain[sc]  with
    X = fft(x_t) * dft_norm, demapped nearest-neighbour.

    packed=True emits both outputs in the kernel's own subcarrier order
    (see ``packed_perm``: natural = out[..., perm] per frame) AND in 3-D
    shape [S, n_sym, M]: that shape is a FREE bitcast of the kernel's
    [S, n_sym, n1d, 128] tile layout, whereas flattening to
    [S, n_sym*M] forces XLA to retile T(8,128) -> T(2,128) — a measured
    75 us full-payload copy PER OUTPUT on the v5e (3 of them, ~0.23 ms,
    were the largest block of the round-5 decode timeline).  Consumers
    reshape host-side.  This is the layout-for-speed contract of the
    "fused_packed" payload impl.

    emit_sig=False (serving mode) skips the equalized-symbol outputs
    entirely — the kernel writes only the int8 decisions, saving their
    HBM writes plus the plane-combine/retile epilogue; returns
    (None, rx_data).
    """
    S, n_sym, M = x_t.shape
    xr = jnp.real(x_t).astype(jnp.float32)
    xi = jnp.imag(x_t).astype(jnp.float32)
    # fold dft_norm into the equalizer gain (equalize is linear)
    gl = (gain * jnp.float32(dft_norm)).astype(jnp.float32)
    # packed per-sc tiles
    wtr = jnp.stack([
        jnp.stack([pack_tile(jnp.real(W[:, o, j]).astype(jnp.float32), M)
                   for j in range(S)])
        for o in range(S)
    ])  # [out, rx, 128, 128]
    wti = jnp.stack([
        jnp.stack([pack_tile(jnp.imag(W[:, o, j]).astype(jnp.float32), M)
                   for j in range(S)])
        for o in range(S)
    ])
    gtile = pack_tile(gl, M)
    sig, d = _payload_fused(
        xr, xi, wtr, wti, gtile, M=M, S=S, n_sym=n_sym,
        table=tuple(np.asarray(table).tolist()), interpret=interpret,
        packed=packed, emit_sig=emit_sig,
    )
    if packed:
        # [S, n_sym, M] — free view of the kernel tiles; do NOT flatten
        # (the [S, n_sym*M] retile costs ~75 us/output on chip)
        return (sig if emit_sig else None), d
    sig = sig.reshape(S, n_sym * M) if emit_sig else None
    return sig, d.reshape(S, n_sym * M)


# ---------------------------------------------------------------------------
# Strip-fused variant: CP strip + FFT + equalize + demap in ONE kernel
# ---------------------------------------------------------------------------

def strip_supported(M: int, m_occ: int, n_streams: int, arity: int,
                    symbol_len: int) -> bool:
    """Geometry gate for the strip-fused kernel (payload_impl
    "fused_strip"): the base fused-kernel gate plus the supergroup
    structure — G = 128/gcd(symbol_len, 128) symbols per 128-lane-aligned
    supergroup, and G must be a whole number of PACK-frame tile groups so
    each grid step processes whole groups."""
    if not supported(M, m_occ, n_streams, arity):
        return False
    g = 128 // math.gcd(symbol_len, 128)
    pack = 128 // (M // 128)
    return g % pack == 0


def _kernel_strip(mr_ref, mi_ref, tr_ref, ti_ref, wr_ref, wi_ref, g_ref,
                  f_ref, *out_refs, S, M, sym, cp, n_sg, cr, ci, cb,
                  emit_sig):
    """One grid step = one supergroup of G symbols read STRAIGHT from the
    flat payload planes; the CP strip happens as in-kernel static
    lane-offset slices (legal on this Mosaic toolchain — probed; the
    slices carry internal lane offsets, so rows are assembled by
    concatenating along the LANE dim, the one place offset-mismatched
    values may meet, then lane-split to [pack, M]).  Replaces the XLA
    pad + supergroup reshape + symbol peel + slice chain (~0.23 ms
    serialized at the reference operating point).

    Two inputs: the MAIN planes cover the first n_sg-1 (whole)
    supergroups; the TAIL planes are one zero-padded supergroup built
    host/XLA-side (tiny) — so no block ever reads out of bounds, which
    keeps behaviour identical between Mosaic and interpret mode (the
    interpreter corrupts non-divisible edge blocks).  Packed outputs
    only (the fused_packed contract).  Reference hot loop:
    framing.cc:535-589.
    """
    if emit_sig:
        er_ref, ei_ref, d_ref = out_refs
    else:
        (d_ref,) = out_refs
        er_ref = ei_ref = None
    n1d = M // 128
    pack = 128 // n1d
    G = 128 // math.gcd(sym, 128)
    gt = g_ref[...]
    i = pl.program_id(0)

    def body(pr_ref, pi_ref):
        for grp in range(G // pack):
            Rr = []
            Ri = []
            for s in range(S):
                def tiles(p_ref):
                    rows = [
                        p_ref[s:s + 1,
                              (grp * pack + c) * sym + cp:
                              (grp * pack + c) * sym + cp + M]
                        for c in range(pack)
                    ]
                    flat = jnp.concatenate(rows, axis=1)  # [1, pack*M]
                    x3 = flat.reshape(pack, n1d, 128)
                    return jnp.transpose(x3, (1, 0, 2)).reshape(128, 128)

                Rr.append(tiles(pr_ref))
                Ri.append(tiles(pi_ref))
            outs = _fft_eq_demap(Rr, Ri, wr_ref, wi_ref, gt, f_ref,
                                 S, cr, ci, cb)
            lo, hi = grp * pack, (grp + 1) * pack
            for out in range(S):
                ar, ai, idx = outs[out]
                if emit_sig:
                    er_ref[out, lo:hi] = jnp.transpose(
                        ar.reshape(n1d, pack, 128), (1, 0, 2))
                    ei_ref[out, lo:hi] = jnp.transpose(
                        ai.reshape(n1d, pack, 128), (1, 0, 2))
                d_ref[out, lo:hi] = jnp.transpose(
                    idx.reshape(n1d, pack, 128), (1, 0, 2))

    if n_sg == 1:
        body(tr_ref, ti_ref)
    else:
        @pl.when(i < n_sg - 1)
        def _():
            body(mr_ref, mi_ref)

        @pl.when(i == n_sg - 1)
        def _():
            body(tr_ref, ti_ref)


@functools.partial(
    jax.jit,
    static_argnames=("M", "S", "n_sym", "sym", "cp", "table", "interpret",
                     "emit_sig"),
)
def _payload_fused_strip(pr, pi, wtr, wti, gtile, *, M, S, n_sym, sym, cp,
                         table, interpret, emit_sig=True):
    n1d = M // 128
    G = 128 // math.gcd(sym, 128)
    n_sg = -(-n_sym // G)
    npad = n_sg * G
    t = np.asarray(table)
    cr = tuple(np.float32(v) for v in t.real)
    ci = tuple(np.float32(v) for v in t.imag)
    cb = tuple(np.float32(v) for v in (np.abs(t) ** 2 / 2.0))
    fft_consts = jnp.asarray(np.stack(_consts(M)))  # [6, 128, 128]

    # main = first n_sg-1 whole supergroups (a FREE lane-prefix view of
    # the flat planes); tail = the last, possibly partial, supergroup
    # zero-padded to a whole block (tiny: <= G*sym lanes).  No pallas
    # block ever reads out of range.
    SG = G * sym
    L1 = (n_sg - 1) * SG
    tlen = pr.shape[1] - L1
    padw = ((0, 0), (0, SG - tlen))
    tr = jnp.pad(pr[:, L1:], padw)
    ti = jnp.pad(pi[:, L1:], padw)
    if L1 > 0:
        # full planes with a CLAMPED index map: steps < n_sg-1 read
        # whole in-range supergroups; the last step's (unused) main
        # block re-reads supergroup n_sg-2 — never the ragged edge, so
        # Mosaic and the interpreter agree
        mr, mi = pr, pi
        m_ix = (lambda i: (0, jnp.minimum(i, n_sg - 2)))
    else:
        mr, mi = tr, ti  # dummy; the main branch never executes
        m_ix = (lambda i: (0, 0))

    kern = functools.partial(_kernel_strip, S=S, M=M, sym=sym, cp=cp,
                             n_sg=n_sg, cr=cr, ci=ci, cb=cb,
                             emit_sig=emit_sig)
    mspec = pl.BlockSpec((S, SG), m_ix)
    tspec = pl.BlockSpec((S, SG), lambda i: (0, 0))
    wspec = pl.BlockSpec((S, S, 128, 128), lambda i: (0, 0, 0, 0))
    gspec = pl.BlockSpec((128, 128), lambda i: (0, 0))
    fspec = pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0))
    ospec = pl.BlockSpec((S, G, n1d, 128), lambda i: (0, i, 0, 0))
    oshape = (S, npad, n1d, 128)
    vma = getattr(jax.typeof(pr), "vma", None)

    def _st(dt):
        return jax.ShapeDtypeStruct(oshape, dt, vma=vma)

    sig_specs = [ospec, ospec] if emit_sig else []
    sig_shapes = [_st(jnp.float32)] * 2 if emit_sig else []
    outs = pl.pallas_call(
        kern,
        grid=(n_sg,),
        in_specs=[mspec, mspec, tspec, tspec, wspec, wspec, gspec, fspec],
        out_specs=sig_specs + [ospec],
        out_shape=sig_shapes + [_st(jnp.int32)],
        interpret=interpret,
    )(mr, mi, tr, ti, wtr, wti, gtile, fft_consts)
    if emit_sig:
        er, ei, d = outs
    else:
        (d,) = outs
        er = ei = None
    # [S, npad, M] — free view (sc' = 128*k1 + k2, the packed_perm
    # layout); the up-to-G-1 trailing pad frames are RETAINED (slicing
    # them off on device would cost a full-payload copy) — consumers
    # score [:, :n_sym] host-side.
    # reshape the f32 planes (free bitcasts) BEFORE the complex
    # combine: reshaping the combined c64 array was a measured ~25 us
    # copy on chip
    sig = (jax.lax.complex(er.reshape(S, npad, M), ei.reshape(S, npad, M))
           if emit_sig else None)
    d = d.reshape(S, npad, M)
    return sig, d


def payload_fused_strip(p_re: jax.Array, p_im: jax.Array, W: jax.Array,
                        gain: jax.Array, table: np.ndarray,
                        dft_norm: float, *, n_sym: int, symbol_len: int,
                        cp_len: int, interpret: bool = False,
                        emit_sig: bool = True):
    """Strip-fused payload tail (payload_impl="fused_strip"): takes the
    FLAT payload planes [S, n_sym*symbol_len] f32 (CPs still in place —
    exactly what extract_payload produces) and performs CP strip + FFT +
    equalize + demap in one Pallas kernel.  Same math and contraction
    order as payload_fused(packed=True); outputs are packed-order
    [S, npad, M] with npad = ceil(n_sym/G)*G (trailing pad frames are
    garbage — consumers read [:, :n_sym]).

    W: [M, out, rx] complex64, gain: [M] float32, all-occupied geometry.
    Returns (rx_sig [S, npad, M] complex64 | None, rx_data [S, npad, M]
    int32)."""
    S = p_re.shape[0]
    M = W.shape[0]
    gl = (gain * jnp.float32(dft_norm)).astype(jnp.float32)
    wtr = jnp.stack([
        jnp.stack([pack_tile(jnp.real(W[:, o, j]).astype(jnp.float32), M)
                   for j in range(S)])
        for o in range(S)
    ])
    wti = jnp.stack([
        jnp.stack([pack_tile(jnp.imag(W[:, o, j]).astype(jnp.float32), M)
                   for j in range(S)])
        for o in range(S)
    ])
    gtile = pack_tile(gl, M)
    return _payload_fused_strip(
        p_re, p_im, wtr, wti, gtile, M=M, S=S, n_sym=n_sym,
        sym=symbol_len, cp=cp_len,
        table=tuple(np.asarray(table).tolist()), interpret=interpret,
        emit_sig=emit_sig,
    )
