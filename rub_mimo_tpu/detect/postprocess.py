"""Shared equalizer-output postprocessing (all pipelines).

normalize_rx_scale and decision-directed common-phase tracking were
copy-pasted at every equalize site (offline/sharded x2/streaming/resume)
and had already drifted (resume lacked track_phase); one helper now owns
the block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.ofdm import constellation


def postprocess_eq(eq: jax.Array, cfg: ModemConfig) -> jax.Array:
    """eq: [..., n_sc] equalized symbols (last axis = occupied carriers;
    per-(symbol, stream) leading axes).  Applies the configured
    normalize_rx_scale compensation and decision-directed common-phase
    tracking."""
    m_occ = cfg.M_occupied
    if cfg.normalize_rx_scale and m_occ != cfg.M:
        eq = eq * np.float32(np.sqrt(m_occ / cfg.M))
    if cfg.track_phase:
        d1 = constellation.demodulate(eq, cfg.modulation)
        ideal = jnp.asarray(constellation.table(cfg.modulation))[d1]
        rot = jnp.sum(eq * jnp.conj(ideal), axis=-1)
        eq = (eq * jnp.exp(-1j * jnp.angle(rot))[..., None]).astype(
            jnp.complex64
        )
    return eq.astype(jnp.complex64)
