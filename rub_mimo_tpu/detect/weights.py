"""Shared detector-weight selection for all three pipelines.

pipeline.rx, pipeline.streaming, and parallel.decode_sharded previously
each had their own copy of the SISO/diversity/MMSE/ZF weight block, and
the copies drifted (mmse_auto_noise was only honoured by the offline
path).  One helper now owns the logic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rub_mimo_tpu.config import CommMode, Detector, ModemConfig
from rub_mimo_tpu.detect import mmse as mmse_mod
from rub_mimo_tpu.detect import zf as zf_mod


def weights_for(
    cfg: ModemConfig,
    G: jax.Array,
    G_occ: jax.Array,
    window: Optional[jax.Array] = None,
    ac_index: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(W [m_occ, out, rx], gain [m_occ]) for the configured detector.

    SISO/RX_DIVERSITY modes equalize outside the W matrix (scalar divide /
    MRC), so they get zero weights + unit gain placeholders.
    mmse_auto_noise needs the estimation window + access-code offsets to
    derive sigma^2 (estimate.ls.estimate_noise_var).
    """
    nv = resolve_noise_var(cfg, G, window, ac_index)
    return weights_from(cfg, G_occ, nv)


def resolve_noise_var(
    cfg: ModemConfig,
    G: jax.Array,
    window: Optional[jax.Array] = None,
    ac_index: Optional[jax.Array] = None,
) -> jax.Array:
    """The sigma^2 the MMSE/SIC detectors will use: measured from the
    estimation window when mmse_auto_noise, else the configured constant."""
    if cfg.detector == Detector.MMSE and cfg.mmse_auto_noise:
        if window is None or ac_index is None:
            raise ValueError(
                "mmse_auto_noise requires the estimation window and "
                "access-code offsets"
            )
        from rub_mimo_tpu.estimate import ls

        return ls.estimate_noise_var(window, ac_index, G, cfg)
    return jnp.float32(cfg.mmse_noise_var)


def weights_from(
    cfg: ModemConfig, G_occ: jax.Array, noise_var: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(W, gain) from the (possibly subcarrier-sliced) occupied-carrier
    channel — per-subcarrier independent, so the 'sc'-sharded decoder can
    call it on each device's slice and get bitwise-identical rows."""
    S = cfg.num_streams
    m_occ = G_occ.shape[0]
    if cfg.mode in (CommMode.SISO, CommMode.RX_DIVERSITY,
                    CommMode.ALAMOUTI) or cfg.detector in (
                        Detector.ML, Detector.SIC):
        # ML/SIC work on the channel directly (detect.ml / detect.sic);
        # no precomputed linear weights
        return (
            jnp.zeros((m_occ, S, S), dtype=jnp.complex64),
            jnp.ones((m_occ,), dtype=jnp.float32),
        )
    if cfg.detector == Detector.MMSE:
        return mmse_mod.mmse_weights(G_occ, noise_var)
    return zf_mod.invert(G_occ, cfg.invert_to_unity)
