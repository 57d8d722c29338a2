"""Shared per-symbol equalization dispatch.

The offline, sharded, and streaming payload stages all equalize a
[n_sym, S, n_sc] frequency-domain grid the same way for the
non-sequential modes/detectors; this helper owns that branch table so
the precedence rules (mode first, then detector) exist in exactly one
place.  Alamouti (adjacent-symbol pairing) and track_channel (sequential
scan) stay in each pipeline — they need cross-symbol structure the
per-grid dispatch cannot see.
"""

from __future__ import annotations

import jax

from rub_mimo_tpu.config import CommMode, Detector, ModemConfig


def equalize_dispatch(
    Y: jax.Array,
    G_occ: jax.Array,
    W: jax.Array,
    gain: jax.Array,
    cfg: ModemConfig,
) -> jax.Array:
    """Y: [n_sym, S(rx), n_sc] -> eq [n_sym, S(out), n_sc]."""
    import jax.numpy as jnp

    from rub_mimo_tpu.detect import siso as siso_mod
    from rub_mimo_tpu.detect import zf as zf_mod

    if cfg.mode == CommMode.SISO:
        eq_one = siso_mod.siso_equalize(Y, G_occ, cfg.siso_rx, cfg.siso_tx)
        return jnp.zeros_like(Y).at[:, cfg.siso_rx, :].set(eq_one)
    if cfg.mode == CommMode.RX_DIVERSITY:
        from rub_mimo_tpu.detect import diversity

        comb = diversity.mrc_combine(Y, G_occ, cfg.siso_tx)
        return jnp.zeros_like(Y).at[:, cfg.siso_tx, :].set(comb)
    if cfg.detector == Detector.ML:
        from rub_mimo_tpu.detect import ml as ml_mod

        return ml_mod.ml_equalize(Y, G_occ, cfg)
    if cfg.detector == Detector.SIC:
        from rub_mimo_tpu.detect import sic as sic_mod

        return sic_mod.sic_equalize(Y, G_occ, cfg, cfg.mmse_noise_var)
    return zf_mod.equalize(Y, W, gain)
