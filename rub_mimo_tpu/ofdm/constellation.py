"""Constellation tables and vectorized mapping/demapping.

Replaces the reference's liquid-dsp ``modem`` objects (created with
LIQUID_MODEM_ARB32OPT in mimo/main.cc:1203-1204, used for payload
modulation at main.cc:1237 and scoring demodulation at main.cc:1405) and its
hand-rolled BPSK/QPSK tables (mimo/framing.cc:35-46).

Demapping is hard-decision nearest-neighbour over the table — the same
decision rule liquid applies for arbitrary modems — implemented as one
batched matmul + argmax so it runs on the MXU for millions of symbols at
once (the reference does ~4M scalar demods serially, main.cc:1403-1411).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import Modulation

_SQRT2 = math.sqrt(2.0)

# Reference BPSK table, mimo/framing.cc:35-39.
BPSK_TABLE = np.array([-1.0 + 0j, 1.0 + 0j], dtype=np.complex64)

# Reference QPSK table with its (deliberate or not) sqrt(2)-per-axis
# amplitude — NOT 1/sqrt(2) — mimo/framing.cc:40-46.  Kept verbatim for
# bit-exact replication of the (compiled-out) QPSK-S1 variant.
QPSK_REFERENCE_TABLE = np.array(
    [
        _SQRT2 + 1j * _SQRT2,
        -_SQRT2 + 1j * _SQRT2,
        -_SQRT2 - 1j * _SQRT2,
        _SQRT2 - 1j * _SQRT2,
    ],
    dtype=np.complex64,
)


def _gray(n: int) -> int:
    return n ^ (n >> 1)


def _square_qam(bits: int) -> np.ndarray:
    """Gray-coded square QAM with unit average energy (QPSK/16/64)."""
    side = 1 << (bits // 2)
    bits_per_axis = bits // 2
    # Gray-code each axis so adjacent points differ in one bit.
    gray_to_level = np.empty(side, dtype=np.int64)
    for lvl in range(side):
        gray_to_level[_gray(lvl)] = lvl
    pts = np.empty(1 << bits, dtype=np.complex128)
    for sym in range(1 << bits):
        gi = sym >> bits_per_axis
        gq = sym & (side - 1)
        i_lvl = gray_to_level[gi]
        q_lvl = gray_to_level[gq]
        pts[sym] = (2 * i_lvl - side + 1) + 1j * (2 * q_lvl - side + 1)
    pts /= np.sqrt(np.mean(np.abs(pts) ** 2))
    return pts.astype(np.complex64)


def _cross32() -> np.ndarray:
    """32-point cross constellation with unit average energy: a 6x6 grid
    with the four corners removed, the standard 32-cross layout.  Used as
    the deterministic starting point for the optimized table below (and
    available on its own for debugging)."""
    pts = []
    for i_lvl in range(-5, 6, 2):
        for q_lvl in range(-5, 6, 2):
            if abs(i_lvl) == 5 and abs(q_lvl) == 5:
                continue  # cut corners
            pts.append(complex(i_lvl, q_lvl))
    pts = np.array(pts, dtype=np.complex128)
    assert len(pts) == 32
    pts /= np.sqrt(np.mean(np.abs(pts) ** 2))
    return pts.astype(np.complex64)


def optimal_constellation(n: int = 32) -> np.ndarray:
    """Design an n-point 'optimal' constellation by the published
    principle behind liquid-dsp's arbXXopt tables (mimo/config.h:107)
    and the classic Foschini/Gitlin/Weinstein result: at high SNR the
    minimum-SEP layout at fixed average energy approaches the densest
    planar packing — a hexagonal (triangular-lattice) cluster.  The
    construction picks the n triangular-lattice points of least energy
    about their own centroid (iterated until the selection is stable),
    recenters, and normalizes to unit average energy.  Deterministic.

    For n=32 this beats the 32-cross by 6.6% minimum distance (0.477 vs
    0.447 at unit energy) and ~2x union-bound SEP at 22 dB.  The layout
    optimizes the same objective as liquid's table but is NOT
    float-identical to it; for symbol-exact parity with captures
    recorded against liquid-modulated signals, install liquid's exact
    point list via set_arb32opt_table / load_arb32opt_table
    (docs/PARITY.md #17)."""
    pts = []
    for a in range(-8, 9):
        for b in range(-8, 9):
            pts.append((a + 0.5 * b) + 1j * (np.sqrt(3) / 2.0) * b)
    pts = np.array(pts, dtype=np.complex128)
    sel = pts[np.argsort(np.abs(pts))[:n]]
    for _ in range(50):  # re-center the selection window until stable
        c = sel.mean()
        new = pts[np.argsort(np.abs(pts - c))[:n]]
        if np.array_equal(np.sort(new.view(float)), np.sort(sel.view(float))):
            break
        sel = new
    sel = sel - sel.mean()
    sel /= np.sqrt(np.mean(np.abs(sel) ** 2))
    # canonical raster order so the symbol mapping is reproducible
    order = np.lexsort((np.round(sel.real, 9), np.round(sel.imag, 9)))
    return sel[order].astype(np.complex64)


_ARB32_OVERRIDE: np.ndarray | None = None


def set_arb32opt_table(points) -> None:
    """Install an EXACT external 32-point table into the ARB32OPT slot
    (e.g. liquid-dsp's published arb32opt list, for symbol-exact demod
    parity with captures recorded by the reference system,
    mimo/main.cc:1203-1204).  Pass None to restore the built-in
    optimized table."""
    global _ARB32_OVERRIDE
    if points is None:
        _ARB32_OVERRIDE = None
    else:
        pts = np.asarray(points, dtype=np.complex64).reshape(-1)
        if pts.shape[0] != 32:
            raise ValueError(f"expected 32 points, got {pts.shape[0]}")
        pts = pts.copy()
        pts.setflags(write=False)
        _ARB32_OVERRIDE = pts
    table.cache_clear()


def load_arb32opt_table(path) -> np.ndarray:
    """Read a 32-point table from .npy (complex or [32,2] float),
    .json ([[re, im], ...]), or text (two floats per line) and install
    it via set_arb32opt_table.  Returns the loaded points."""
    import json as _json
    from pathlib import Path as _Path

    path = _Path(path)
    if path.suffix == ".npy":
        arr = np.load(path)
    elif path.suffix == ".json":
        arr = np.asarray(_json.loads(path.read_text()), dtype=np.float64)
    else:
        arr = np.loadtxt(path, dtype=np.float64)
    arr = np.asarray(arr)
    if np.iscomplexobj(arr):
        pts = arr.astype(np.complex64).reshape(-1)
    else:
        arr = arr.reshape(-1, 2)
        pts = (arr[:, 0] + 1j * arr[:, 1]).astype(np.complex64)
    set_arb32opt_table(pts)
    return pts


@functools.lru_cache(maxsize=1)
def _arb32_optimal() -> np.ndarray:
    t = optimal_constellation(32)
    t.setflags(write=False)
    return t


@functools.lru_cache(maxsize=16)
def table(modulation: Modulation) -> np.ndarray:
    if modulation == Modulation.BPSK:
        t = BPSK_TABLE.copy()
    elif modulation == Modulation.QPSK:
        t = _square_qam(2)
    elif modulation == Modulation.QAM16:
        t = _square_qam(4)
    elif modulation == Modulation.QAM64:
        t = _square_qam(6)
    elif modulation == Modulation.QAM256:
        t = _square_qam(8)
    elif modulation == Modulation.ARB32OPT:
        t = (_ARB32_OVERRIDE.copy() if _ARB32_OVERRIDE is not None
             else _arb32_optimal().copy())
    else:  # pragma: no cover
        raise ValueError(f"unknown modulation {modulation}")
    t.setflags(write=False)
    return t


def modulate(symbols: jax.Array, modulation: Modulation) -> jax.Array:
    """Map integer symbols in [0, arity) to constellation points."""
    t = jnp.asarray(table(modulation))
    return t[symbols]


def demodulate(y: jax.Array, modulation: Modulation) -> jax.Array:
    """Hard-decision nearest-neighbour demapping, batched on the MXU.

    argmin_c |y - c|^2 = argmax_c ( Re(y) Re(c) + Im(y) Im(c) - |c|^2 / 2 )

    which is one real [N, 2] x [2, arity] matmul plus a bias — arbitrarily
    shaped y is flattened and restored.
    """
    t = table(modulation)
    shape = y.shape
    yf = y.reshape(-1)
    yr = jnp.stack([jnp.real(yf), jnp.imag(yf)], axis=-1).astype(jnp.float32)
    cm = jnp.asarray(
        np.stack([t.real, t.imag], axis=0).astype(np.float32)
    )  # [2, arity]
    bias = jnp.asarray((np.abs(t) ** 2 / 2.0).astype(np.float32))
    scores = (
        jnp.dot(yr, cm, preferred_element_type=jnp.float32) - bias[None, :]
    )
    return jnp.argmax(scores, axis=-1).astype(jnp.int32).reshape(shape)


def soft_demodulate_llr(
    y: jax.Array, modulation: Modulation, noise_var: float | jax.Array = 1.0
) -> jax.Array:
    """Max-log-MAP bit LLRs (new capability beyond the reference's
    hard-decision modem): returns [..., bits_per_symbol] LLRs."""
    t = table(modulation)
    bits = modulation.bits_per_symbol
    shape = y.shape
    yf = y.reshape(-1)
    d2 = jnp.abs(yf[:, None] - jnp.asarray(t)[None, :]) ** 2  # [N, arity]
    metric = -d2 / jnp.asarray(noise_var, dtype=d2.dtype)
    idx = np.arange(len(t))
    llrs = []
    for b in range(bits):
        bit = (idx >> (bits - 1 - b)) & 1
        m1 = jnp.max(jnp.where(jnp.asarray(bit == 1), metric, -jnp.inf), axis=-1)
        m0 = jnp.max(jnp.where(jnp.asarray(bit == 0), metric, -jnp.inf), axis=-1)
        llrs.append(m0 - m1)
    return jnp.stack(llrs, axis=-1).reshape(*shape, bits)
