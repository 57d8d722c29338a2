"""Checkpoint / resume for decode runs.

The reference's record-then-replay design is its checkpoint: raw captures
persisted to /tmp are re-read and decoded offline (mimo/main.cc:881-887,
906-922).  Here the capture file stays the durable input, and the derived
pipeline state — sync index, Ghat, equalizer weights, decoded symbols,
frame counter — is persisted as one .npz plus the capture manifest, so a
run can be resumed (or its expensive stages skipped) deterministically:

  - `save` after a decode stores everything re-derivable state-free
  - `resume_decode` re-equalizes a capture with the SAVED sync/CSI state,
    skipping sync + matched filter + estimation — deterministic replay
    from the recorded decision points (SURVEY §5 failure recovery)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from rub_mimo_tpu.config import CommMode, ModemConfig
from rub_mimo_tpu.pipeline.rx import DecodeResult
from rub_mimo_tpu.utils.transfer import to_host


def save(path: str | os.PathLike, cfg: ModemConfig, result: DecodeResult) -> None:
    np.savez_compressed(
        path,
        config_json=np.frombuffer(cfg.to_json().encode(), dtype=np.uint8),
        synced=np.int32(bool(to_host(result.synced))),
        sync_index=np.int64(int(to_host(result.sync_index))),
        decode_start=np.int64(int(to_host(result.decode_start))),
        plateau_start=to_host(result.plateau_start),
        plateau_end=to_host(result.plateau_end),
        cfo_hat=np.float32(float(to_host(result.cfo_hat))),
        cfo_coarse=np.float32(float(to_host(result.cfo_coarse))),
        G=to_host(result.G),
        W=to_host(result.W),
        normalize_gain=to_host(result.normalize_gain),
        ac_index=to_host(result.ac_index),
        rx_data=to_host(result.rx_data),
        symbol_valid=to_host(result.symbol_valid),
    )


class Checkpoint:
    def __init__(self, path: str | os.PathLike):
        z = np.load(path)
        self.config = ModemConfig.from_json(
            bytes(z["config_json"]).decode()
        )
        self.synced = bool(z["synced"])
        self.sync_index = int(z["sync_index"])
        self.decode_start = int(z["decode_start"])
        self.plateau_start = z["plateau_start"]
        self.plateau_end = z["plateau_end"]
        self.cfo_hat = float(z["cfo_hat"])
        self.cfo_coarse = float(z["cfo_coarse"]) if "cfo_coarse" in z else 0.0
        self.G = z["G"]
        self.W = z["W"]
        self.normalize_gain = z["normalize_gain"]
        self.ac_index = z["ac_index"]
        self.rx_data = z["rx_data"]
        self.symbol_valid = z["symbol_valid"]


def load(path: str | os.PathLike) -> Checkpoint:
    return Checkpoint(path)


def resume_decode(
    capture,
    ckpt: Checkpoint,
    from_frame: int = 0,
    cfg: Optional[ModemConfig] = None,
):
    """Re-equalize a capture using the checkpointed sync/CSI state.

    Skips the sync + matched-filter + estimation stages entirely: the
    saved sync_index/decode_start/W/gain drive the payload slice directly.
    `from_frame` restarts mid-run (deterministic: frame k always maps to
    the same capture samples; must be even for ALAMOUTI so the pairing
    stays aligned).  Returns (rx_sig, rx_data) for frames
    [from_frame, pid_max).
    """
    import jax
    import jax.numpy as jnp

    from rub_mimo_tpu.detect import siso as siso_mod
    from rub_mimo_tpu.detect import zf as zf_mod
    from rub_mimo_tpu.ofdm import constellation, sctype

    cfg = cfg or ckpt.config
    if cfg.mode == CommMode.ALAMOUTI and from_frame % 2:
        raise ValueError("ALAMOUTI resume requires an even from_frame")
    S = cfg.num_streams
    m_occ = cfg.M_occupied
    p = cfg.subcarrier_allocation()
    occ_idx = jnp.asarray(sctype.occupied_indices(p))
    n_sym = cfg.pid_max - from_frame
    # absolute capture offset of frame `from_frame`
    start = (
        ckpt.sync_index - cfg.symbol_len + ckpt.decode_start
        + from_frame * cfg.symbol_len
    )
    W = jnp.asarray(ckpt.W)
    gain = jnp.asarray(ckpt.normalize_gain)
    G_occ = jnp.asarray(ckpt.G)[occ_idx]

    # CFO state the original decode applied (coarse: global phase ref 0;
    # residual: phase ref = window start = sync_index - symbol_len)
    eps_c = np.float32(ckpt.cfo_coarse)
    eps_r = np.float32(ckpt.cfo_hat - ckpt.cfo_coarse)
    wstart = np.float32(ckpt.sync_index - cfg.symbol_len)

    @jax.jit
    def run(iq):
        if cfg.correct_cfo and (eps_c != 0.0 or eps_r != 0.0):
            g = jnp.arange(iq.shape[-1], dtype=jnp.float32)
            phase = eps_c * g + eps_r * (g - wstart)
            iq = (iq * jnp.exp(-2j * jnp.pi * phase / cfg.M)[None, :]
                  ).astype(jnp.complex64)
        padded = jnp.pad(iq, ((0, 0), (0, n_sym * cfg.symbol_len)))
        payload = jax.lax.dynamic_slice(
            padded,
            (jnp.int32(0), jnp.int32(max(start, 0))),
            (S, n_sym * cfg.symbol_len),
        ).reshape(S, n_sym, cfg.symbol_len)
        x_t = payload[:, :, cfg.cp_len :]
        X = jnp.fft.fft(x_t, axis=-1) * np.float32(1.0 / np.sqrt(m_occ))
        Y = jnp.moveaxis(X[:, :, occ_idx], 1, 0)
        if cfg.mode == CommMode.SISO:
            eq_one = siso_mod.siso_equalize(Y, G_occ, cfg.siso_rx, cfg.siso_tx)
            eq = jnp.zeros_like(Y).at[:, cfg.siso_rx, :].set(eq_one)
        elif cfg.mode == CommMode.RX_DIVERSITY:
            # the checkpointed W is a zero placeholder in this mode —
            # re-combine with MRC from the saved channel estimate
            from rub_mimo_tpu.detect import diversity

            comb = diversity.mrc_combine(Y, G_occ, cfg.siso_tx)
            eq = jnp.zeros_like(Y).at[:, cfg.siso_tx, :].set(comb)
        elif cfg.mode == CommMode.ALAMOUTI:
            # W is a zero placeholder here too: re-combine the pairs from
            # the saved channel estimate (requires even from_frame so the
            # pairing stays aligned)
            from rub_mimo_tpu.detect import alamouti as alamouti_mod

            dec1 = alamouti_mod.combine_pairs(Y, G_occ)
            eq = jnp.zeros_like(Y).at[:, 0, :].set(dec1)
        else:
            eq = zf_mod.equalize(Y, W, gain)
        from rub_mimo_tpu.detect.postprocess import postprocess_eq

        eq = postprocess_eq(eq, cfg)
        rx_sig = jnp.moveaxis(eq, 0, 1).reshape(S, n_sym * m_occ)
        return rx_sig, constellation.demodulate(rx_sig, cfg.modulation)

    return run(jnp.asarray(capture))
