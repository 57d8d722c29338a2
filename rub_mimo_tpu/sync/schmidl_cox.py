"""Schmidl&Cox frame synchronization as whole-block array ops.

TPU-native replacement for the reference's per-sample sync state machine
(STATE_SEEK_PLATEAU, mimo/framing.cc:591-637):

  per sample, per stream (framing.cc:626-637):
    xd[t]     = x[t - M/2]                       (wdelaycf, zero history)
    corr[t]   = -sum_{k<M/2} conj(xd[t-k]) x[t-k]  (firfilt_crcf, taps -1.0;
                 the sign is squared away — the "FIXME why not 1.0f" quirk
                 at framing.cc:342 is metric-neutral)
    energy[t] = 0.5 * sum_{k<M} |x[t-k]|^2        (firfilt_rrrf, taps 0.5)
    metric[t] = |corr[t]|^2 / energy[t]^2

  plateau logic (framing.cc:601-623): per stream track the current run of
  metric > 0.95; sync fires at the first sample where EVERY stream is in a
  run longer than cp_len; sync_index = floor(mean of per-stream run starts).

Here the streaming filters become chunked cumsum-differences
(utils.movsum), the run tracking becomes a cummax over "last index below
threshold", and the first-fire search becomes one argmax — the entire
multi-million-sample scan is a single fused XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.utils.movsum import delay, moving_sum


class SyncResult(NamedTuple):
    """Everything the reference's sync stage reports (main.cc:1430-1440)."""

    synced: jax.Array          # bool — did sync fire anywhere in the capture
    sync_sample: jax.Array     # int32 — sample at which sync fired (t*)
    sync_index: jax.Array      # int32 — floor(mean of per-stream run starts)
    plateau_start: jax.Array   # int32[streams] — run start at t*
    plateau_end: jax.Array     # int32[streams] — == t* while in plateau
    metric: jax.Array | None   # float32[streams, T] (optional debug output)
    cfo_hat: jax.Array         # float32 — CFO estimate, subcarrier units


def sc_metric(x: jax.Array, M: int, *, block: int = 1 << 15):
    """S&C timing metric for the whole capture.

    x: [streams, T] complex; returns (metric[streams, T] float32,
    corr[streams, T] complex64 — the un-squared moving correlation, kept for
    CFO estimation).
    """
    M2 = M // 2
    xd = delay(x, M2)
    prod = jnp.conj(xd) * x
    corr = -moving_sum(prod, M2, block=block)
    energy = 0.5 * moving_sum(
        (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(jnp.float32),
        M,
        block=block,
    )
    corr_mag2 = (jnp.real(corr) ** 2 + jnp.imag(corr) ** 2).astype(jnp.float32)
    metric = corr_mag2 / (energy * energy)
    return metric, corr


def plateau_scan(
    metric: jax.Array,
    cp_len: int,
    threshold: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized replication of the serial plateau state machine.

    metric: [streams, T].  Returns (synced, t_star, run_start[streams, T_at_t*]).

    For each stream the current run start at t is (last index with
    metric <= threshold before t) + 1; the fire condition at t is
      all_s [ metric[s,t] > thr  AND  t - run_start[s,t] > cp_len ]
    and t* is the first t where it holds (framing.cc:601-623: with
    in_plateau, plateau_end == t and plateau_start == run_start).
    """
    S, T = metric.shape
    above = metric > threshold  # NaN > thr -> False, same as C float
    idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    # last index not-above (or -1); cummax of masked indices
    last_below = jax.lax.cummax(
        jnp.where(above, jnp.int32(-1), idx), axis=1
    )
    run_start = last_below + 1
    cond = above & ((idx - run_start) > cp_len)
    fire = jnp.all(cond, axis=0)
    t_star = jnp.argmax(fire).astype(jnp.int32)
    synced = fire[t_star]
    starts = run_start[:, t_star]
    return synced, t_star, starts


def synchronize(
    x: jax.Array,
    cfg: ModemConfig,
    *,
    keep_metric: bool = False,
    block: int = 1 << 15,
    impl: str = "auto",
) -> SyncResult:
    """Full sync stage: metric + plateau scan + CFO estimate.

    impl: "auto" uses the fused one-pass Pallas kernel
    (kernels.sc_sync) on the TPU backend when the caller does not need
    the metric array — ~8 full-capture HBM round trips collapse to one
    sweep; "xla" forces the chunked array-op path (always used on CPU
    and for keep_metric); "pallas" forces the kernel (interpret-mode on
    non-TPU backends, for tests)."""
    use_kernel = impl == "pallas" or (
        impl == "auto"
        and not keep_metric
        and jax.default_backend() == "tpu"
    )
    if use_kernel:
        from rub_mimo_tpu.kernels.sc_sync import sc_sync_fused

        synced, t_star, starts, c_at = sc_sync_fused(
            x, cfg.M, cfg.cp_len, cfg.plateau_threshold, block=block,
            interpret=jax.default_backend() != "tpu",
        )
        sync_index = (jnp.sum(starts) // cfg.num_streams).astype(jnp.int32)
        cfo_hat = jnp.angle(jnp.sum(-c_at)).astype(jnp.float32) / np.pi
        return SyncResult(
            synced=synced,
            sync_sample=t_star,
            sync_index=sync_index,
            plateau_start=starts,
            plateau_end=jnp.broadcast_to(
                t_star, (cfg.num_streams,)
            ).astype(jnp.int32),
            metric=None,
            cfo_hat=cfo_hat,
        )
    metric, corr = sc_metric(x, cfg.M, block=block)
    synced, t_star, starts = plateau_scan(
        metric, cfg.cp_len, cfg.plateau_threshold
    )
    sync_index = (jnp.sum(starts) // cfg.num_streams).astype(jnp.int32)

    # CFO from the S&C correlation phase at the fire sample: the delayed
    # product accumulates phase 2*pi*eps/M per sample over an M/2 lag, so
    # angle(P) = pi * eps  (eps in subcarrier-spacing units).  The extra pi
    # from the negated taps (framing.cc:342) is removed by negating corr.
    c_at = corr[:, t_star]
    cfo_hat = jnp.angle(jnp.sum(-c_at)).astype(jnp.float32) / np.pi

    return SyncResult(
        synced=synced,
        sync_sample=t_star,
        sync_index=sync_index,
        plateau_start=starts,
        plateau_end=jnp.broadcast_to(t_star, (cfg.num_streams,)).astype(
            jnp.int32
        ),
        metric=metric if keep_metric else None,
        cfo_hat=cfo_hat,
    )


def correct_cfo(x: jax.Array, cfo_subcarriers: jax.Array, M: int) -> jax.Array:
    """De-rotate the capture by a CFO given in subcarrier-spacing units
    (new capability — the reference leaves this as a FIXME,
    framing.cc:486)."""
    T = x.shape[-1]
    n = jnp.arange(T, dtype=jnp.float32)
    rot = jnp.exp(-2j * jnp.pi * cfo_subcarriers * n / M)
    return (x * rot[None, :]).astype(jnp.complex64)
