"""Device-to-host transfer shims.

Some TPU attachment paths only implement host transfers for float32/int32
arrays (complex64, bool, and 0-d scalars fail with UNIMPLEMENTED).  These
helpers reshape/bitcast on DEVICE into transfer-safe dtypes and reassemble
on host, so the pipeline's results (complex symbol streams, bool flags,
scalar indices) can always be fetched.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def to_host(x: Any) -> np.ndarray:
    """Fetch a jax array as numpy, working around limited-transfer backends."""
    import jax.numpy as jnp

    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    try:
        return np.asarray(x)
    except Exception:
        pass
    arr = x
    shape = arr.shape
    if arr.ndim == 0:
        arr = arr.reshape(1)
    dt = arr.dtype
    if dt == jnp.complex64 or dt == jnp.complex128:
        re = np.asarray(jnp.real(arr).astype(jnp.float32).reshape(-1, 1))
        im = np.asarray(jnp.imag(arr).astype(jnp.float32).reshape(-1, 1))
        out = (re[:, 0] + 1j * im[:, 0]).astype(np.complex64)
        return out.reshape(shape)
    if dt == jnp.bool_:
        out = np.asarray(arr.astype(jnp.int32)).astype(bool)
        return out.reshape(shape)
    out = np.asarray(arr.astype(jnp.float32) if dt in (jnp.float64,)
                     else arr.astype(jnp.int32) if dt in (jnp.int64, jnp.uint32, jnp.int8, jnp.uint8, jnp.int16, jnp.uint16)
                     else arr)
    return out.reshape(shape)


def fetch_tree(tree: Any) -> Any:
    """to_host over an arbitrary pytree (e.g. a DecodeResult)."""
    import jax

    return jax.tree_util.tree_map(
        lambda v: to_host(v) if hasattr(v, "dtype") else v, tree
    )
