"""Batched window gathers that lower to a single XLA gather.

The obvious way to grab many M-sample windows at dynamic offsets —
``jax.vmap(lambda off, rx: lax.dynamic_slice(window[rx], (off,), (M,)))``
— is a perf trap on TPU: the vmapped row index ``window[rx]`` becomes a
batched gather of ENTIRE rows, which XLA lowers to a while loop that
materializes one full window-length copy per batch element (measured:
~40 ms of a 55 ms full-capture decode, carrying an f32[80, 1, 2.3M]
loop buffer).  Flattening to one element-level gather of [n, length]
indices makes the same operation ~free.

Semantics match the dynamic_slice version exactly, including the start
clamp to [0, W - length] (out-of-range starts are clipped, not wrapped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_windows(
    arr: jax.Array, rows: jax.Array, starts: jax.Array, length: int
) -> jax.Array:
    """Stacked ``dynamic_slice(arr[rows[i]], (starts[i],), (length,))``.

    arr:    [R, W] (any dtype)
    rows:   [n] integer row ids (static or traced)
    starts: [n] integer window starts (traced); clamped to [0, W - length]
    returns [n, length]
    """
    W = arr.shape[-1]
    starts = jnp.clip(jnp.asarray(starts).astype(jnp.int32), 0, W - length)
    rows = jnp.asarray(rows).astype(jnp.int32)
    flat = arr.reshape(-1)
    idx = (
        (rows * W)[:, None]
        + starts[:, None]
        + jnp.arange(length, dtype=jnp.int32)[None, :]
    )
    return flat[idx]
