"""Device-to-host transfer shims.

Some TPU attachment paths (tunneled single-chip PJRT) only implement
device->host transfers and op-by-op execution for real f32/i32 arrays:
complex64 transfers and eager complex ops fail with UNIMPLEMENTED, while
complex math INSIDE jit-compiled programs works fine.  These helpers fetch
arbitrary arrays by running a tiny jitted conversion on device (complex ->
stacked real/imag float32, bool/wide ints -> int32) and reassembling on
host.  On normal backends the fast path is a plain np.asarray.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np


@functools.lru_cache(maxsize=None)
def _splitter():
    import jax
    import jax.numpy as jnp

    # ONE stacked f32 output, not (real, imag) as two outputs: the
    # two-output c64->f32,f32 program takes the axon remote compiler
    # ~30 s per distinct input shape (vs 0.4 s for this form) and
    # intermittently dies with UNIMPLEMENTED under load — streaming's
    # variable-length frame emits hit a fresh shape (and a fresh
    # pathological compile) on nearly every chunk.
    @jax.jit
    def split(x):
        return jnp.stack(
            [jnp.real(x).astype(jnp.float32),
             jnp.imag(x).astype(jnp.float32)]
        )

    return split


@functools.lru_cache(maxsize=None)
def _to_i32():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda x: x.astype(jnp.int32))


@functools.lru_cache(maxsize=None)
def _to_f32():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda x: x.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _bitcast_i32():
    """Jitted lossless bitcast to int32 words.  64-bit inputs gain a
    trailing axis of 2; 32-bit inputs keep their shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    return jax.jit(lambda x: lax.bitcast_convert_type(x, jnp.int32))


@functools.lru_cache(maxsize=None)
def _direct_transfer_ok(dtype_str: str) -> bool:
    """Probe (once per process per dtype) whether the current backend can
    transfer this dtype device->host directly.  The probe uses a throwaway
    device array, so a failed attempt poisons only the probe, never a user
    array."""
    import jax

    try:
        probe = jax.device_put(np.zeros((1,), dtype=dtype_str))
        if str(probe.dtype) != dtype_str:  # e.g. x64-disabled downcast
            return False
        np.asarray(probe)
        return True
    except Exception:
        return False


def _bitcast_fetch(x, host_dtype) -> np.ndarray:
    """Lossless fetch of a wide type via int32 words + host-side view."""
    words = np.ascontiguousarray(np.asarray(_bitcast_i32()(x)))
    out = words.view(host_dtype)
    if out.ndim and out.shape[-1] == 1 and words.shape != out.shape:
        out = out[..., 0]
    return out


def to_host(x: Any) -> np.ndarray:
    """Fetch a jax array as numpy, working around limited-transfer backends.

    Dtype is inspected BEFORE attempting a direct transfer: on the axon
    attachment a failed complex64/bool transfer attempt poisons the
    array (every later operation on it raises UNIMPLEMENTED too), so
    possibly-unsupported dtypes must route through a jitted conversion
    without ever trying np.asarray first.  Whether a dtype needs the
    workaround is probed once per process on a throwaway array, so on
    full backends (CPU/GPU) every dtype takes the direct path; on limited
    backends wide integers/floats ride int32 words LOSSLESSLY (bitcast +
    host-side view) rather than a narrowing cast."""
    import jax.numpy as jnp

    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    dt = getattr(x, "dtype", None)
    if dt is None:
        return np.asarray(x)
    ndt = np.dtype(dt)
    if ndt in (np.dtype(np.float32), np.dtype(np.int32)):
        return np.asarray(x)  # always transferable, even on axon
    if _direct_transfer_ok(str(ndt)):
        return np.asarray(x)
    if ndt == np.complex64:
        planes = np.asarray(_splitter()(x))
        return (planes[0] + 1j * planes[1]).astype(np.complex64)
    if ndt == np.complex128:
        # split to f64 halves, each fetched losslessly via int32 words
        re = _bitcast_fetch(jnp.real(x), np.float64)
        im = _bitcast_fetch(jnp.imag(x), np.float64)
        return re + 1j * im
    if ndt == np.dtype(bool):
        return np.asarray(_to_i32()(x)).astype(bool)
    if ndt.kind in "iuf" and ndt.itemsize in (4, 8):
        return _bitcast_fetch(x, ndt)  # uint32/int64/uint64/float64
    if ndt.kind in "iu":
        return np.asarray(_to_i32()(x)).astype(ndt)  # sub-32-bit ints
    return np.asarray(_to_f32()(x)).astype(ndt)  # f16/bf16 via f32


@functools.lru_cache(maxsize=None)
def _tree_converter():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def convert(leaves):
        out = []
        for v in leaves:
            dt = v.dtype
            if dt in (jnp.complex64, jnp.complex128):
                out.append((jnp.real(v).astype(jnp.float32),
                            jnp.imag(v).astype(jnp.float32)))
            elif dt == jnp.bool_ or jnp.issubdtype(dt, jnp.integer):
                out.append(v.astype(jnp.int32))
            else:
                out.append(v.astype(jnp.float32))
        return out

    return convert


def fetch_tree(tree: Any) -> Any:
    """to_host over an arbitrary pytree (e.g. a DecodeResult) in ONE jitted
    conversion program — on limited-transfer backends every separate
    compile is expensive, so all leaves convert together."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, v in enumerate(leaves) if hasattr(v, "dtype")]
    if not idx:
        return tree
    try:
        converted = _tree_converter()([leaves[i] for i in idx])
    except Exception:
        # fall back to per-leaf fetch
        return jax.tree_util.tree_map(
            lambda v: to_host(v) if hasattr(v, "dtype") else v, tree
        )
    out = list(leaves)
    for j, i in enumerate(idx):
        c = converted[j]
        orig = leaves[i]
        if isinstance(c, tuple):
            out[i] = (np.asarray(c[0]) + 1j * np.asarray(c[1])).astype(
                np.complex64
            )
        elif orig.dtype == jnp.bool_:
            out[i] = np.asarray(c).astype(bool)
        elif jnp.issubdtype(orig.dtype, jnp.integer):
            out[i] = np.asarray(c)
        else:
            out[i] = np.asarray(c).astype(orig.dtype)
    return jax.tree_util.tree_unflatten(treedef, out)
