"""Streaming (online, chunked) decode with carried state.

The offline pipeline (pipeline.rx) needs the whole capture in memory; this
module processes IQ in ARRIVING chunks — the live-pipeline analog of the
reference's rx_worker (which could only log to disk and decode afterwards,
mimo/main.cc:872-922).  Pairs with io.native.StreamReader so file ingest,
host->device transfer, and device compute overlap.

Design: a host-side phase machine over jitted, fixed-chunk-size device
steps; all heavy state stays on device:

  SEEK     s&c metric with an (M-1)-sample carried tail + plateau carry
           (global last-below-threshold index per stream); fires exactly
           like the offline plateau scan.
  COLLECT  fill the estimation-region buffer [S, region_len] (starting one
           symbol before sync_index) by masked placement of each chunk.
  (estimate) matched filter + LS + detector weights on the filled region —
           the same code the offline pipeline uses.
  PAYLOAD  per chunk, decode every OFDM symbol whose LAST sample arrives
           in that chunk (unique ownership), reading into a carried
           (symbol_len-1)-sample tail; emit equalized symbols + indices.

The streamed result reproduces the offline decode of the concatenated
capture (tests/test_streaming.py verifies exact symbol equality across
chunk sizes).  Caveat: the S&C metric's float32 moving sums restart at
chunk boundaries, whose positions differ from the offline path's blocks —
identical math, different summation order — so a metric value within
rounding distance of the plateau threshold at a boundary sample could in
principle flip a sync decision the offline path made differently.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rub_mimo_tpu.config import CommMode, ModemConfig
from rub_mimo_tpu.detect import zf as zf_mod
from rub_mimo_tpu.estimate import ls
from rub_mimo_tpu.ofdm import constellation, sctype
from rub_mimo_tpu.sync import matched_filter, schmidl_cox
from rub_mimo_tpu.utils.transfer import to_host


@dataclasses.dataclass
class BurstRecord:
    """Snapshot of one completed frame burst (multi-burst streaming).

    The reference handles exactly one burst per process run
    (mimo/main.cc:906-922); re-arming after a burst is new capability —
    a live pipeline that can re-acquire indefinitely."""

    sync_index: int
    decode_start: int
    cfo_hat: float
    frames: Dict[int, np.ndarray]
    G: Optional[jax.Array]
    fb_used: bool


class StreamingDecoder:
    def __init__(self, cfg: ModemConfig, chunk_size: int = 1 << 16,
                 frontend_comp: bool = False, warmup_chunks: int = 4,
                 sfo_correct: bool = False):
        """frontend_comp: blind DC-offset + IQ-imbalance compensation
        (estimate.frontend) in the stream — the first `warmup_chunks`
        chunks are buffered, the moments estimated over them, and then
        both the buffered and all later chunks pass through the
        conjugate-cancellation before the decoder sees them.

        sfo_correct: LIVE sampling-frequency-offset correction (the
        streaming analog of estimate.sfo.decode_with_sfo's two-pass
        offline loop).  Requires cfg.track_channel=True: the tracked
        per-block channel refits both keep the current burst decodable
        under the drift AND carry the SFO observable — the per-subcarrier
        phase ADVANCE between consecutive raw refits has slope
        2*pi*delta*C/M across subcarriers.  The advance statistic
        accumulates on device (no per-chunk host sync); at each burst
        re-arm the estimate is frozen into `sfo_hat` and a
        StreamingResampler (utils.resample) with carried fractional
        phase is engaged/retuned, so every later burst is decoded from
        the resampled stream.  Within-burst residue is absorbed by the
        tracker, as offline."""
        cfg.validate()
        self.cfg = cfg
        self._fe_comp = bool(frontend_comp)
        self._fe_warmup = int(warmup_chunks)
        self._fe_buf: List[jax.Array] = []
        self._fe_dc = None
        self._fe_w = None
        self._sfo_on = bool(sfo_correct)
        if self._sfo_on and not cfg.track_channel:
            raise ValueError(
                "sfo_correct requires cfg.track_channel=True (the tracked "
                "refits are both the live equalizer under drift and the "
                "SFO observable)"
            )
        self.C = int(chunk_size)
        S = cfg.num_streams
        self.S = S
        M = cfg.M
        sym = cfg.symbol_len
        if self.C < sym:
            raise ValueError("chunk_size must be >= symbol_len")
        n_seq = 1 + cfg.num_access_codes * S
        self.region_len = sym * n_seq + M
        # backfill depth at the sync transition: the region can start up to
        # ~(symbol_len + plateau width) before the fire sample, which may
        # itself be early in the chunk — keep the whole previous chunk plus
        # margin so the region backfill always has the samples
        self._recent_len = self.C + sym + 2 * M

        p = cfg.subcarrier_allocation()
        self._occ = jnp.asarray(sctype.occupied_indices(p))
        self.m_occ = cfg.M_occupied

        # ---- device state ----
        self.gpos = 0  # host: global samples consumed
        # all-zero complex device states are CREATED ON DEVICE via jit:
        # a host->device complex upload intermittently fails on the axon
        # tunnel (and poisons the array for every later use)
        def _czeros(shape):
            return jax.jit(lambda: jnp.zeros(shape, jnp.complex64))()

        self._tail = _czeros((S, M - 1))
        self._recent = _czeros((S, self._recent_len))
        self._last_below = -jnp.ones((S,), jnp.int32)
        self.phase = "seek"
        self._cur_synced = False
        self._cur_sync_index: Optional[int] = None
        self._region = _czeros((S, self.region_len))
        self.region_start: Optional[int] = None
        self.W = None
        self.gain = None
        self.G = None
        self._cur_decode_start: Optional[int] = None  # global frame-0 CP start
        self._ptail = _czeros((S, sym - 1))
        self.frames: dict[int, np.ndarray] = {}  # k -> [S, m_occ] complex64
        self._pend: dict[int, np.ndarray] = {}  # raw Y awaiting its pair
        # device-resident payload ring queue (zero per-chunk transfers)
        self._ring_len = self.region_len + 3 * self.C
        self._q_r = 0          # read offset into the ring
        self._q_w = 0          # write offset
        self._q_count = 0      # buffered samples
        self._q_gpos = 0       # global position of the sample at _q_r
        self._cur_cfo_hat = 0.0       # accumulated CFO estimate (subcarriers)
        self._eps0 = 0.0         # coarse rotation applied to incoming data
        self._eps_r = 0.0        # post-estimation rotation (ref region_start)
        self._fb_used = False
        # multi-burst: completed bursts re-arm the phase machine back to
        # seek; records accumulate here (burst 0 first)
        self.bursts: List[BurstRecord] = []
        self._burst_end: Optional[int] = None  # global end of payload span
        self._in_replay = False  # re-arm replay in progress

        # live SFO state (sfo_correct=True): the accumulated
        # per-subcarrier frame-differential moment z[m_occ] — the SAME
        # statistic the offline estimator reduces the whole capture to
        # (estimate.sfo), built incrementally from each payload block's
        # static-equalized residuals against tracked decisions
        self.sfo_hat = 0.0  # accumulated fractional-rate estimate (host f64)
        self._resampler = None  # engaged at the first burst re-arm
        if self._sfo_on:
            self._sfo_z = jax.jit(
                lambda: jnp.zeros((self.m_occ,), jnp.complex64)
            )()

        self._build_steps()

    # -- public view: FIRST-burst attributes (the reference's
    # one-burst-per-run semantics); the live _cur_* fields track the
    # burst currently being acquired ----------------------------------- #
    @property
    def synced(self) -> bool:
        return True if self.bursts else self._cur_synced

    @property
    def sync_index(self) -> Optional[int]:
        return (self.bursts[0].sync_index if self.bursts
                else self._cur_sync_index)

    @property
    def decode_start(self) -> Optional[int]:
        return (self.bursts[0].decode_start if self.bursts
                else self._cur_decode_start)

    @property
    def cfo_hat(self) -> float:
        return (self.bursts[0].cfo_hat if self.bursts
                else self._cur_cfo_hat)

    # ------------------------------------------------------------------ #
    def _build_steps(self):
        cfg = self.cfg
        S, C, M = self.S, self.C, cfg.M
        sym = cfg.symbol_len
        thr = cfg.plateau_threshold
        cp = cfg.cp_len
        region_len = self.region_len
        m_occ = self.m_occ
        occ = self._occ

        @jax.jit
        def sync_step(tail, last_below, chunk, gpos):
            """Returns (tail', last_below', fired, t_star, starts)."""
            ext = jnp.concatenate([tail, chunk], axis=-1)
            metric_ext, corr_ext = schmidl_cox.sc_metric(
                ext, M, block=min(1 << 15, C + M - 1)
            )
            metric = metric_ext[:, M - 1 :]  # [S, C]
            gidx = gpos + jnp.arange(C, dtype=jnp.int32)
            above = metric > thr
            masked = jnp.where(above, jnp.int32(-1), gidx[None, :])
            local_cm = jax.lax.cummax(masked, axis=1)
            lb = jnp.maximum(local_cm, last_below[:, None])
            run_start = lb + 1
            cond = above & ((gidx[None, :] - run_start) > cp)
            # all-streams rule, or >= sync_quorum streams (robust mode)
            q = (cfg.num_streams if cfg.sync_quorum is None
                 else cfg.sync_quorum)
            cond_all = jnp.sum(cond, axis=0) >= q
            fired = jnp.any(cond_all)
            t_loc = jnp.argmax(cond_all).astype(jnp.int32)
            starts = run_start[:, t_loc]
            t_star = gidx[t_loc]
            corr = corr_ext[:, M - 1 :]
            corr_at = corr[:, t_loc]
            # participation mask (all-true under the all-streams rule):
            # drives the quorum-mode sync_index / CFO combining
            pmask = jnp.where(fired, cond[:, t_loc],
                              jnp.ones((S,), jnp.bool_))
            return (
                ext[:, -(M - 1):],
                lb[:, -1],
                fired.astype(jnp.int32),
                t_star,
                starts,
                corr_at,
                pmask.astype(jnp.int32),
            )

        @jax.jit
        def place_step(region, data, data_gpos, region_start):
            """Add data (global start data_gpos) into the region buffer."""
            L = data.shape[-1]
            pad = jnp.pad(data, ((0, 0), (region_len, region_len)))
            # region[j] covers global region_start + j; we need the slice of
            # `data` that overlaps -> same pad/clip trick as the sharded path
            start = jnp.clip(
                region_start - data_gpos + region_len, 0, L + region_len
            )
            part = jax.lax.dynamic_slice(
                pad, (jnp.int32(0), start.astype(jnp.int32)), (S, region_len)
            )
            return region + part

        joint = (not cfg.bit_exact) and cfg.timing_mode == "joint"

        @jax.jit
        def estimate_step(region):
            from rub_mimo_tpu.detect import weights as weights_mod

            mf = matched_filter.search(region, cfg, joint=joint)
            G = ls.estimate_channel(region, mf.ac_index, cfg)
            if cfg.smooth_channel:
                from rub_mimo_tpu.estimate import smooth

                G = smooth.smooth_channel_estimate(G, cfg)
            W, gain = weights_mod.weights_for(
                cfg, G, G[occ], region, mf.ac_index
            )
            dstart = (mf.ac_index[S - 1, -1] + M).astype(jnp.int32)
            return G, W, gain, dstart

        nloc = C // sym + 1

        @jax.jit
        def payload_step(ptail, chunk, W, gain, G, pstart, gpos):
            """Decode symbols whose last sample is inside this chunk."""
            ext = jnp.concatenate([ptail, chunk], axis=-1)  # [S, sym-1+C]
            base = gpos - (sym - 1)
            # owned: g in [gpos - sym + 1, gpos + C - sym + 1)
            k0 = -((pstart - base) // sym)
            k0 = jnp.maximum(k0, 0).astype(jnp.int32)
            ks = k0 + jnp.arange(nloc, dtype=jnp.int32)
            gs = pstart + ks * sym
            rels = gs - base
            owned = (
                (gs >= base)
                & (gs < gpos + C - sym + 1)
                & (ks < cfg.pid_max)
            )

            def grab(rel):
                r = jnp.clip(rel, 0, C - 1)
                return jax.lax.dynamic_slice(
                    ext, (jnp.int32(0), r.astype(jnp.int32)), (S, sym)
                )

            wins = jax.vmap(grab)(rels)  # [nloc, S, sym]
            X = jnp.fft.fft(wins[:, :, cp:], axis=-1) * np.float32(
                1.0 / np.sqrt(m_occ)
            )
            Y = X[:, :, occ]
            G_occ = G[occ]
            # the emitted grid leaves the device as STACKED f32 planes
            # [2(re/im), nloc, S, m_occ]: a direct f32 fetch needs no
            # conversion jit at all — the c64 (real, imag) splitter
            # program takes this attachment's remote compiler 30-170 s
            # and intermittently dies with UNIMPLEMENTED (round 4)
            def planes(z):
                return jnp.stack([
                    jnp.real(z).astype(jnp.float32),
                    jnp.imag(z).astype(jnp.float32),
                ])

            if cfg.mode == CommMode.ALAMOUTI:
                # emit raw frequency-domain symbols; pairs are combined on
                # the host once both halves have arrived (_emit)
                return (ext[:, -(sym - 1):], planes(Y), ks,
                        owned.astype(jnp.int32))
            from rub_mimo_tpu.detect.dispatch import equalize_dispatch

            eq = equalize_dispatch(Y, G_occ, W, gain, cfg)
            from rub_mimo_tpu.detect.postprocess import postprocess_eq

            eq = postprocess_eq(eq, cfg)
            return (ext[:, -(sym - 1):], planes(eq), ks,
                    owned.astype(jnp.int32))

        @jax.jit
        def fb_step(tail, chunk):
            """Per-chunk normalized S0 xcorr over windows starting in
            [gpos - (M-1), gpos + C - M]; returns (best_score, best_rel)
            with best_rel relative to the ext start.

            Windows holding almost no energy are excluded (relative
            floor vs the chunk's strongest window): a window containing
            one or two isolated samples degenerates to the template's
            self-peak ratio, which can exceed the fallback threshold on
            stream-edge padding — the offline path is immune because its
            global argmax always prefers the real S0."""
            from rub_mimo_tpu.sync.xcorr_sync import normalized_s0_score
            from rub_mimo_tpu.utils.movsum import moving_sum

            ext = jnp.concatenate([tail, chunk], axis=-1)  # [S, C+M-1]
            score = normalized_s0_score(ext, cfg, C)
            e_in = (jnp.real(ext) ** 2 + jnp.imag(ext) ** 2).astype(
                jnp.float32
            )
            e_win = moving_sum(e_in, M)
            e_fwd = jnp.sum(
                jnp.roll(e_win, -(M - 1), axis=-1)[:, :C], axis=0
            )
            score = jnp.where(e_fwd > 0.05 * jnp.max(e_fwd), score, 0.0)
            j = jnp.argmax(score).astype(jnp.int32)
            return score[j], j

        @jax.jit
        def derotate(data, eps, start_gpos, ref):
            """data[g] * exp(-2j pi eps (g - ref)/M), g global from
            start_gpos."""
            n = data.shape[-1]
            g = start_gpos.astype(jnp.float32) + jnp.arange(
                n, dtype=jnp.float32
            )
            rot = jnp.exp(-2j * jnp.pi * eps * (g - ref) / M)
            return (data * rot[None, :]).astype(jnp.complex64)

        @jax.jit
        def mf_step(region):
            mf = matched_filter.search(region, cfg, joint=joint)
            return mf.s0_index, mf.ac_index

        @jax.jit
        def s0_halves_step(region, s0_index):
            from rub_mimo_tpu.estimate import cfo as cfo_mod

            return cfo_mod.s0_halves_cfo(region, s0_index, cfg)

        @jax.jit
        def residual_step(region, ac_index):
            from rub_mimo_tpu.estimate import cfo as cfo_mod

            return cfo_mod.residual_cfo(region, ac_index, cfg)

        # tracked-refit granularity: groups of gf frames scanned WITHIN
        # each payload block (the streaming mirror of the offline
        # lax.scan tracker).  Live SFO estimation needs fine groups so
        # the tracker out-paces the within-group ramp (same bf<=4 rule
        # as estimate.sfo.decode_with_sfo); plain tracking follows the
        # configured block size.
        nloc_t = C // sym + 1
        gf = (min(cfg.track_block_frames, 4) if self._sfo_on
              else cfg.track_block_frames)
        gf = max(1, min(gf, nloc_t))
        ng = -(-nloc_t // gf)
        npad = ng * gf - nloc_t
        sfo_on = self._sfo_on

        @jax.jit
        def payload_step_track(ptail, chunk, Gfull, W0, gain0, pstart,
                               gpos, z_in):
            """payload_step variant for track_channel: scans gf-frame
            groups, each equalized with the CARRIED channel estimate (ZF)
            and refitting it from the group's owned decisions.

            With sfo_correct, the block also accumulates the offline
            estimator's statistic incrementally (estimate.sfo): the raw
            frequency symbols are STATICALLY equalized with the preamble
            weights (W0, gain0) so the SFO phase ramp stays intact, the
            tracked decisions serve as the reference, and the
            frame-differential moment z[m_occ] += sum_n r[n+1] conj(r[n])
            is carried across chunks on device.  Returns
            (ptail', eq, ks, owned, Gfull', z_out)."""
            from rub_mimo_tpu.detect import tracking as tracking_mod
            from rub_mimo_tpu.detect.postprocess import postprocess_eq

            ext = jnp.concatenate([ptail, chunk], axis=-1)
            base = gpos - (sym - 1)
            k0 = jnp.maximum(-((pstart - base) // sym), 0).astype(jnp.int32)
            ks = k0 + jnp.arange(nloc_t, dtype=jnp.int32)
            gs = pstart + ks * sym
            rels = gs - base
            owned = (
                (gs >= base) & (gs < gpos + C - sym + 1) & (ks < cfg.pid_max)
            )

            def grab(rel):
                r = jnp.clip(rel, 0, C - 1)
                return jax.lax.dynamic_slice(
                    ext, (jnp.int32(0), r.astype(jnp.int32)), (S, sym)
                )

            wins = jax.vmap(grab)(rels)
            X = jnp.fft.fft(wins[:, :, cp:], axis=-1) * np.float32(
                1.0 / np.sqrt(m_occ)
            )
            Y = X[:, :, occ]  # [nloc, S, m_occ]
            G_occ0 = Gfull[occ]
            table = jnp.asarray(constellation.table(cfg.modulation))

            Yg = jnp.concatenate(
                [Y, jnp.zeros((npad, S, m_occ), Y.dtype)], axis=0
            ).reshape(ng, gf, S, m_occ)
            og = jnp.concatenate(
                [owned, jnp.zeros((npad,), bool)], axis=0
            ).reshape(ng, gf)

            def body(G_occ, xs):
                Yb, ob = xs
                W, gain = zf_mod.invert(G_occ, cfg.invert_to_unity)
                eq = zf_mod.equalize(Yb, W, gain)
                d = constellation.demodulate(eq, cfg.modulation)
                s_hat = table[d]
                m = ob.astype(jnp.complex64)[:, None, None]
                G_new = tracking_mod.ls_refit(Yb * m, s_hat * m)
                ok = jnp.sum(ob) > 0
                a = jnp.where(ok, jnp.float32(cfg.track_alpha), 0.0)
                G2 = ((1.0 - a) * G_occ + a * G_new).astype(jnp.complex64)
                return G2, (eq, s_hat)

            G_occ_f, (eqg, shg) = jax.lax.scan(body, G_occ0, (Yg, og))
            eq = eqg.reshape(ng * gf, S, m_occ)[:nloc_t]
            z_out = z_in
            if sfo_on:
                s_hat_all = shg.reshape(ng * gf, S, m_occ)[:nloc_t]
                y_st = zf_mod.equalize(Y, W0, gain0)
                om = owned.astype(jnp.complex64)[:, None, None]
                r = y_st * jnp.conj(s_hat_all) * om
                # adjacent-frame pairs within the block (spacing exactly
                # one symbol); both frames must be owned
                z_out = z_in + jnp.sum(
                    r[1:] * jnp.conj(r[:-1]), axis=(0, 1)
                )
            Gfull = Gfull.at[occ].set(G_occ_f)
            eq = postprocess_eq(eq, cfg)
            eq_planes = jnp.stack([
                jnp.real(eq).astype(jnp.float32),
                jnp.imag(eq).astype(jnp.float32),
            ])
            return (ext[:, -(sym - 1):], eq_planes, ks,
                    owned.astype(jnp.int32), Gfull, z_out)

        @jax.jit
        def recent_step(recent, chunk):
            return jnp.concatenate([recent, chunk], axis=-1)[
                :, -self._recent_len:
            ]

        @jax.jit
        def seek_scan(tail, last_below, recent, blocks, gpos0):
            """Seek over MANY chunks in one device program: lax.scan of
            the per-chunk sync step; bit-identical state carries.  The
            host fetches ONE [K] int32 fired vector instead of one
            boolean per chunk (the per-chunk fetch bounded live seek
            throughput to ~6e8 samples/s through the tunneled
            attachment — VERDICT r3 item 6)."""
            def body(carry, blk):
                t, lb, rec, g = carry
                t2, lb2, fired, _, _, _, _ = sync_step(t, lb, blk, g)
                return (t2, lb2, recent_step(rec, blk),
                        g + jnp.int32(C)), fired

            (t2, lb2, rec2, _), fired = jax.lax.scan(
                body, (tail, last_below, recent, gpos0), blocks
            )
            return t2, lb2, rec2, fired

        @jax.jit
        def block_split(x):  # [S, K*C] -> [K, S, C] (on device: eager
            return jnp.moveaxis(   # complex ops fail on axon)
                x.reshape(S, -1, C), 1, 0
            )

        @jax.jit
        def block_chunk(blocks, k):  # dynamic k: one compile for all K
            return jax.lax.dynamic_index_in_dim(blocks, k, 0,
                                                keepdims=False)

        @jax.jit
        def ala_combine(Ypair_planes, Gfull):
            """Ypair planes [2(re/im), 2, S, m_occ] raw -> combined
            lane-0 frames as planes [2(re/im), 2, S, m_occ] with
            postprocessing (scale/phase-track).  Planes in AND out: the
            pair buffer lives on the host, and both host->device complex
            uploads and c64 fetch-conversion compiles are unreliable on
            the axon attachment."""
            from rub_mimo_tpu.detect import alamouti as alamouti_mod

            from rub_mimo_tpu.detect.postprocess import postprocess_eq

            Ypair = jax.lax.complex(Ypair_planes[0], Ypair_planes[1])
            dec = alamouti_mod.combine_pairs(Ypair, Gfull[occ])  # [2, m_occ]
            eq = jnp.zeros_like(Ypair).at[:, 0, :].set(dec)
            eq = postprocess_eq(eq, cfg)
            return jnp.stack([
                jnp.real(eq).astype(jnp.float32),
                jnp.imag(eq).astype(jnp.float32),
            ])

        self._ala_combine = ala_combine
        self._sync_step = sync_step
        self._place_step = place_step
        self._estimate_step = estimate_step
        self._payload_step = payload_step
        self._payload_step_track = payload_step_track
        L = self._ring_len

        @functools.partial(jax.jit, static_argnames=("n",))
        def ring_write(ring, data, start, w, n):
            """Scatter data[:, start:start+n] at ring offset w (wrapping)."""
            sl = jax.lax.dynamic_slice(
                data, (jnp.int32(0), start.astype(jnp.int32)), (S, n)
            )
            idx = (w + jnp.arange(n, dtype=jnp.int32)) % L
            return ring.at[:, idx].set(sl)

        @jax.jit
        def ring_read(ring, r):
            idx = (r + jnp.arange(C, dtype=jnp.int32)) % L
            return ring[:, idx]

        # created ON DEVICE (a host->device complex upload can hit the
        # axon tunnel's transfer limitations; a jitted constant cannot)
        self._ring = jax.jit(
            lambda: jnp.zeros((S, L), jnp.complex64)
        )()
        self._zero_chunk = jax.jit(
            lambda: jnp.zeros((S, C), jnp.complex64)
        )()
        self._ring_write = ring_write
        self._ring_read = ring_read
        self._recent_step = recent_step
        self._seek_scan = seek_scan
        self._block_split = block_split
        self._block_chunk = block_chunk
        self._fb_step = fb_step
        self._derotate = derotate
        self._mf_step = mf_step
        self._s0_halves_step = s0_halves_step
        self._residual_step = residual_step

    # ------------------------------------------------------------------ #
    def push(self, chunk) -> List[Tuple[int, np.ndarray]]:
        """Feed one [S, chunk_size] chunk (numpy or device array);
        returns newly decoded frames as
        (frame_index, [S, M_occupied] complex64) pairs."""
        if chunk.shape != (self.S, self.C):
            raise ValueError(
                f"chunk must be [{self.S}, {self.C}], got {chunk.shape}"
            )
        if self._fe_comp:
            from rub_mimo_tpu.estimate import frontend

            if self._fe_dc is None:
                if not isinstance(chunk, np.ndarray):
                    chunk = np.asarray(to_host(chunk))
                self._fe_buf.append(chunk)
                if len(self._fe_buf) < self._fe_warmup:
                    return []
                return self._fe_start()
            chunk = np.asarray(to_host(
                frontend.compensate(jnp.asarray(chunk), self._fe_dc,
                                    self._fe_w)
            ))
        if self._resampler is not None:
            # live SFO engaged: raw chunks feed the carried-phase
            # resampler; the decoder consumes its (pipeline-delayed)
            # corrected output chunks
            emitted: List[Tuple[int, np.ndarray]] = []
            for c in self._resampler.push(jnp.asarray(chunk)):
                emitted += self._push_inner(c)
            return emitted
        return self._push_inner(chunk)

    def push_block(self, samples) -> List[Tuple[int, np.ndarray]]:
        """Feed MANY chunks ([S, K*chunk_size], K >= 1) at once.

        While the decoder is seeking, the whole block runs as ONE device
        program (``seek_scan``) with a single [K]-int32 fetch, instead of
        one host round-trip per chunk — on the tunneled attachment each
        fetch costs ~0.1 ms, which bounded live seek throughput at ~6e8
        samples/s regardless of device speed.  If sync fires inside the
        block (or the decoder is in any other phase, or a feature that
        needs per-chunk host logic is active: fallback sync, front-end
        warmup, live SFO), the block is replayed through the ordinary
        per-chunk ``push`` from unchanged state, so results are
        bit-identical to chunk-at-a-time feeding."""
        C = self.C
        T = samples.shape[-1]
        if samples.shape[0] != self.S or T % C:
            raise ValueError(
                f"push_block needs [{self.S}, K*{C}] samples, got "
                f"{samples.shape}"
            )
        K = T // C
        fast_ok = (
            self.phase == "seek"
            and K > 1
            and not self.cfg.sync_fallback
            and self._resampler is None
            and not (self._fe_comp and self._fe_dc is None)
        )
        if not isinstance(samples, np.ndarray):
            blocks = self._block_split(samples)
        else:
            blocks = jnp.asarray(
                np.moveaxis(samples.reshape(self.S, K, C), 1, 0)
            )
        if not fast_ok:
            emitted: List[Tuple[int, np.ndarray]] = []
            for k in range(K):
                emitted += self.push(self._block_chunk(blocks, k))
            return emitted
        if self._fe_comp:
            from rub_mimo_tpu.estimate import frontend

            blocks = jax.jit(
                lambda b, dc, w: jax.vmap(
                    lambda c: frontend.compensate(c, dc, w)
                )(b)
            )(blocks, self._fe_dc, self._fe_w)
        t2, lb2, rec2, fired = self._seek_scan(
            self._tail, self._last_below, self._recent, blocks,
            jnp.int32(self.gpos),
        )
        if not bool(np.any(np.asarray(to_host(fired)))):
            # no sync in the whole block: commit the scanned state
            self._tail, self._last_below, self._recent = t2, lb2, rec2
            self.gpos += K * C
            return []
        # sync fired somewhere inside: state was not committed — replay
        # chunk-by-chunk through the ordinary path (exact per-chunk
        # semantics for the fire transition and everything after)
        emitted = []
        for k in range(K):
            emitted += self._push_inner(self._block_chunk(blocks, k))
        return emitted

    def _fe_start(self) -> List[Tuple[int, np.ndarray]]:
        """Estimate the front-end moments over the warmup buffer, then
        replay the buffered chunks through the compensated path."""
        from rub_mimo_tpu.estimate import frontend

        allc = jnp.asarray(np.concatenate(self._fe_buf, axis=-1))
        self._fe_dc, self._fe_w = frontend.estimate_frontend(allc)
        emitted: List[Tuple[int, np.ndarray]] = []
        for c in self._fe_buf:
            emitted += self._push_inner(np.asarray(
                to_host(frontend.compensate(jnp.asarray(c), self._fe_dc,
                                            self._fe_w))
            ))
        self._fe_buf = []
        return emitted

    def _push_inner(self, chunk) -> List[Tuple[int, np.ndarray]]:
        cfg = self.cfg
        emitted: List[Tuple[int, np.ndarray]] = []
        gpos = self.gpos
        if isinstance(chunk, np.ndarray):
            # numpy complex arrays cannot be passed directly into jit on
            # the axon attachment; jnp.asarray's host->device path works.
            # Device chunks (e.g. sliced on device by a bench) pass as-is.
            chunk = jnp.asarray(chunk)

        M = cfg.M
        if self.phase == "seek":
            prev_tail = self._tail  # fb shares the (M-1)-sample history
            (self._tail, self._last_below, fired, t_star, starts,
             corr_at, pmask) = self._sync_step(
                self._tail, self._last_below, chunk, jnp.int32(gpos)
            )
            fired_h = bool(int(to_host(fired)))
            fb_fired = False
            # the xcorr fallback is suppressed while replaying the re-arm
            # window: it would rescan the previous burst's payload tail,
            # which the offline multi-burst path (rx.decode_all) erases
            if not fired_h and cfg.sync_fallback and not self._in_replay:
                q, jrel = self._fb_step(prev_tail, chunk)
                if float(to_host(q)) > cfg.sync_fallback_threshold:
                    fb_fired = True
                    p = gpos - (M - 1) + int(to_host(jrel))
                    self._cur_sync_index = p + M - cfg.cp_len
            self._recent = self._recent_step(self._recent, chunk)
            if fired_h or fb_fired:
                self._cur_synced = True
                self._fb_used = fb_fired
                if fired_h:
                    mk = np.asarray(to_host(pmask)).astype(bool)
                    st = np.asarray(to_host(starts))
                    self._cur_sync_index = int(
                        st[mk].sum() // max(int(mk.sum()), 1)
                    )
                    if cfg.correct_cfo:
                        ca = np.asarray(to_host(corr_at))
                        self._eps0 = float(
                            np.angle(np.sum(-ca[mk])) / np.pi
                        )
                self.region_start = self._cur_sync_index - cfg.symbol_len
                self.phase = "collect"
                # backfill the region from the recent buffer (which already
                # includes this chunk); derotate raw samples at placement
                recent = self._recent
                rec_gpos = gpos + self.C - self._recent_len
                if cfg.correct_cfo and self._eps0 != 0.0:
                    recent = self._derotate(
                        recent, jnp.float32(self._eps0),
                        jnp.float32(rec_gpos), jnp.float32(0.0),
                    )
                self._region = self._place_step(
                    self._region, recent, jnp.int32(rec_gpos),
                    jnp.int32(self.region_start),
                )
        elif self.phase == "collect":
            data = chunk
            if cfg.correct_cfo and self._eps0 != 0.0:
                data = self._derotate(
                    chunk, jnp.float32(self._eps0), jnp.float32(gpos),
                    jnp.float32(0.0),
                )
            self._region = self._place_step(
                self._region, data, jnp.int32(gpos),
                jnp.int32(self.region_start),
            )
        elif self.phase == "payload":
            data = chunk
            if cfg.correct_cfo and self._eps0 != 0.0:
                data = self._derotate(
                    chunk, jnp.float32(self._eps0), jnp.float32(gpos),
                    jnp.float32(0.0),
                )
            self._enqueue(data, gpos)
        self.gpos = gpos + self.C

        # region complete? -> estimate, seed the payload queue from the
        # region buffer, then stream
        if (
            self.phase == "collect"
            and self.gpos >= self.region_start + self.region_len
        ):
            region_final = self._region
            if cfg.correct_cfo:
                # mirror pipeline.rx: optional S0-halves coarse (fallback
                # sync) + access-code residual, phase ref = region start
                s0_idx, ac_idx = self._mf_step(region_final)
                eps_s0 = 0.0
                if self._fb_used:
                    eps_s0 = float(to_host(
                        self._s0_halves_step(region_final, s0_idx)
                    ))
                probe = region_final
                if cfg.sync_fallback and eps_s0 != 0.0:
                    probe = self._derotate(
                        region_final, jnp.float32(eps_s0),
                        jnp.float32(0.0), jnp.float32(0.0),
                    )
                eps1 = float(to_host(self._residual_step(probe, ac_idx)))
                self._eps_r = eps_s0 + eps1
                if self._eps_r != 0.0:
                    region_final = self._derotate(
                        region_final, jnp.float32(self._eps_r),
                        jnp.float32(0.0), jnp.float32(0.0),
                    )
                self._cur_cfo_hat = self._eps0 + self._eps_r
            self.G, self.W, self.gain, dstart = self._estimate_step(
                region_final
            )
            self._cur_decode_start = self.region_start + int(to_host(dstart))
            self._burst_end = (
                self._cur_decode_start + cfg.pid_max * cfg.symbol_len
            )
            self.phase = "payload"
            # everything consumed so far lives in the region buffer (and
            # possibly an overshoot tail of this chunk beyond region_end)
            region_end = self.region_start + self.region_len
            self._q_r = self._q_w = self._q_count = 0
            self._q_gpos = self.region_start
            self._enqueue(self._region, self.region_start)
            overshoot = self.gpos - region_end
            if overshoot > 0:
                src = chunk
                if cfg.correct_cfo and self._eps0 != 0.0:
                    # the payload queue lives in coarse-derotated space
                    src = self._derotate(
                        chunk, jnp.float32(self._eps0),
                        jnp.float32(gpos), jnp.float32(0.0),
                    )
                self._enqueue(src, region_end,
                              start=self.C - overshoot, n=overshoot)

        emitted += self._drain()
        return emitted

    def _enqueue(self, data, data_gpos: int, start: int = 0,
                 n: int | None = None) -> None:
        """Append data[:, start:start+n] to the DEVICE ring queue (one
        jitted scatter; nothing crosses the host boundary — eager complex
        ops and complex transfers are unreliable on the axon tunnel)."""
        if isinstance(data, np.ndarray):
            data = jnp.asarray(data)
        if n is None:
            n = int(data.shape[-1]) - start
        if n <= 0:
            return
        if self._q_count and data_gpos != self._q_gpos + self._q_count:
            raise AssertionError("payload queue must stay contiguous")
        if self._q_count == 0:
            self._q_gpos = int(data_gpos)
        if self._q_count + n > self._ring_len:
            raise AssertionError("payload ring overflow")
        self._ring = self._ring_write(
            self._ring, data, jnp.int32(start), jnp.int32(self._q_w), n
        )
        self._q_w = (self._q_w + n) % self._ring_len
        self._q_count += n

    def _drain(self) -> List[Tuple[int, np.ndarray]]:
        """Consume the payload queue in exact C-sized steps.  When a block
        covers the last payload sample of the burst, the burst is complete:
        snapshot it and re-arm the phase machine for the next burst."""
        if self.phase != "payload":
            return []
        out: List[Tuple[int, np.ndarray]] = []
        while self.phase == "payload" and self._q_count >= self.C:
            seg = self._dequeue()
            out += self._payload_block(seg)
            if seg[1] + self.C >= self._burst_end:
                out += self._rearm()
        return out

    def _rearm(self) -> List[Tuple[int, np.ndarray]]:
        """Burst complete: record it, reset to SEEK, and replay the
        chunk-aligned tail of the device ring (every sample from the last
        chunk boundary at-or-before the payload end) through the seek
        machinery, so a preamble already received — even one straddling
        the burst boundary — is not dropped.  Replayed samples pass
        through the same _push_inner phase logic at their original global
        positions; the ring retains them because its capacity exceeds the
        maximum queue backlog by 2 chunks (asserted)."""
        cfg = self.cfg
        end = self._burst_end
        gpos0 = self.gpos
        # snapshot the finished burst (burst-0 semantics for result())
        self.bursts.append(BurstRecord(
            sync_index=int(self._cur_sync_index),
            decode_start=int(self._cur_decode_start),
            cfo_hat=float(self._cur_cfo_hat),
            frames=self.frames,
            G=self.G,
            fb_used=self._fb_used,
        ))
        # replay window: whole C-chunks covering [end, gpos0)
        k = max(0, -(-(gpos0 - end) // self.C))
        replay_start = gpos0 - k * self.C

        def _ring_chunk(g):
            """Read chunk [g, g+C) back from the payload ring, undoing
            the old burst's coarse derotation if present."""
            off = (self._q_r + (g - self._q_gpos)) % self._ring_len
            data = self._ring_read(self._ring, jnp.int32(off))
            if cfg.correct_cfo and self._eps0 != 0.0:
                data = self._derotate(
                    data, jnp.float32(-self._eps0), jnp.float32(g),
                    jnp.float32(0.0),
                )
            return data

        chunks = []
        for i in range(k):
            g = replay_start + i * self.C
            assert gpos0 - g <= self._ring_len, "re-arm replay out of ring"
            chunks.append(_ring_chunk(g))

        # live SFO: reduce the accumulated moment z to a delta with the
        # SAME weighted-LS fit the offline estimator uses, fold it into
        # sfo_hat, and engage/retune the carried-phase resampler so the
        # NEXT burst decodes from the corrected stream.
        if self._sfo_on:
            from rub_mimo_tpu.estimate import sfo as sfo_est

            delta_inc = float(to_host(
                sfo_est.fit_subcarrier_slope(self._sfo_z, cfg)
            ))
            if np.isfinite(delta_inc) and delta_inc != 0.0:
                self.sfo_hat += delta_inc
                factor = 1.0 / (1.0 + self.sfo_hat)
                if self._resampler is None:
                    from rub_mimo_tpu.utils.resample import (
                        StreamingResampler,
                    )

                    # engage at replay_start (not gpos0): the next
                    # burst's preamble may already sit inside the replay
                    # window, and the estimation region must not
                    # straddle a raw/resampled seam.  Preload the ring
                    # with raw history so the first output window reads
                    # real samples instead of zeros, then route the
                    # replay itself through the resampler.
                    rs = StreamingResampler(
                        self.S, self.C, factor=factor,
                        origin=replay_start,
                    )
                    n_pre = -(-(rs.margin + 16) // self.C)
                    for i in range(n_pre, 0, -1):
                        g = replay_start - i * self.C
                        if g < 0 or gpos0 - g > self._ring_len:
                            continue
                        rs.preload_history(_ring_chunk(g), g)
                    self._resampler = rs
                    resampled = []
                    for data in chunks:
                        resampled += rs.push(data)
                    chunks = resampled  # lags by the window lookahead
                else:
                    self._resampler.set_factor(factor)
            self._sfo_z = jax.jit(
                lambda: jnp.zeros((self.m_occ,), jnp.complex64)
            )()
        # reset the phase machine (public burst-1 attributes — synced,
        # sync_index, decode_start, cfo_hat, G/W — stay visible until a
        # NEW burst overwrites them)
        def _czeros(shape):
            return jax.jit(lambda: jnp.zeros(shape, jnp.complex64))()

        S, M, sym = self.S, cfg.M, cfg.symbol_len
        self._tail = _czeros((S, M - 1))
        self._recent = _czeros((S, self._recent_len))
        self._last_below = -jnp.ones((S,), jnp.int32)
        self._region = _czeros((S, self.region_len))
        self._ptail = _czeros((S, sym - 1))
        self.frames = {}
        self._pend = {}
        self._q_r = self._q_w = self._q_count = 0
        self._q_gpos = 0
        self._eps0 = 0.0
        self._eps_r = 0.0
        self._fb_used = False
        self._burst_end = None
        self.phase = "seek"
        # replay through the normal phase logic at original positions
        emitted: List[Tuple[int, np.ndarray]] = []
        self.gpos = replay_start
        self._in_replay = True
        try:
            for data in chunks:
                emitted += self._push_inner(data)
        finally:
            self._in_replay = False
        # when the replay was routed through a freshly-engaged resampler,
        # its pipeline lookahead holds back the last chunks — they emerge
        # on subsequent pushes; otherwise the replay lands exactly at the
        # pre-rearm position
        assert self.gpos <= gpos0, "re-arm replay position mismatch"
        return emitted

    def _dequeue(self):
        data = self._ring_read(self._ring, jnp.int32(self._q_r))
        gp = self._q_gpos
        self._q_r = (self._q_r + self.C) % self._ring_len
        self._q_count -= self.C
        self._q_gpos += self.C
        return data, gp

    def _payload_block(self, seg) -> List[Tuple[int, np.ndarray]]:
        data, data_gpos = seg
        if self.cfg.correct_cfo and self._eps_r != 0.0:
            # queued payload is in coarse-derotated space; apply the
            # post-estimation rotation (phase ref = region start)
            data = self._derotate(
                data, jnp.float32(self._eps_r), jnp.float32(data_gpos),
                jnp.float32(self.region_start),
            )
        if self.cfg.track_channel:
            z_in = (self._sfo_z if self._sfo_on
                    else jax.jit(lambda: jnp.zeros(
                        (self.m_occ,), jnp.complex64))())
            (self._ptail, eq, ks, owned, self.G,
             z_out) = self._payload_step_track(
                self._ptail, data, self.G, self.W, self.gain,
                jnp.int32(self._cur_decode_start), jnp.int32(data_gpos),
                z_in,
            )
            if self._sfo_on:
                # device-side accumulation: no host sync until re-arm
                self._sfo_z = z_out
        else:
            self._ptail, eq, ks, owned = self._payload_step(
                self._ptail, data, self.W, self.gain, self.G,
                jnp.int32(self._cur_decode_start), jnp.int32(data_gpos),
            )
        return self._emit(eq, ks, owned)

    def finalize(self) -> List[Tuple[int, np.ndarray]]:
        """Flush the remaining queued payload with zero padding (exactly
        what the offline pipeline's zero-extended replay window does)."""
        out: List[Tuple[int, np.ndarray]] = []
        if self._fe_comp and self._fe_dc is None and self._fe_buf:
            # stream ended inside the warmup window: estimate on what we
            # have and replay
            out += self._fe_start()
        if self._resampler is not None:
            # flush the resampler's pipeline delay (zero-padded input)
            for c in self._resampler.flush():
                out += self._push_inner(c)
        if self.phase != "payload" or self._q_count == 0:
            return out
        pad = self.C - (self._q_count % self.C)
        if pad != self.C:
            last_gpos = self._q_gpos + self._q_count
            self._enqueue(self._zero_chunk, last_gpos, n=pad)
        return out + self._drain()

    def _emit(self, eq_planes, ks, owned):
        ks_h = np.asarray(to_host(ks))
        owned_h = np.asarray(to_host(owned)).astype(bool)
        out = []
        if not owned_h.any():
            return out
        ph = np.asarray(to_host(eq_planes))  # [2, nloc, S, m_occ] f32
        eq_h = (ph[0] + 1j * ph[1]).astype(np.complex64)
        if self.cfg.mode.value == "alamouti":
            import jax.numpy as jnp

            for i in np.nonzero(owned_h)[0]:
                k = int(ks_h[i])
                if k >= self.cfg.pid_max or k in self.frames or k in self._pend:
                    continue
                self._pend[k] = eq_h[i]
                mate = k ^ 1
                if mate in self._pend:
                    k0 = min(k, mate)
                    pair = np.stack(
                        [self._pend.pop(k0), self._pend.pop(k0 + 1)]
                    )
                    pair_planes = np.stack(
                        [pair.real, pair.imag]
                    ).astype(np.float32)
                    ch = np.asarray(to_host(self._ala_combine(
                        jnp.asarray(pair_planes), self.G
                    )))
                    comb = (ch[0] + 1j * ch[1]).astype(np.complex64)
                    for d in (0, 1):
                        self.frames[k0 + d] = comb[d]
                        out.append((k0 + d, comb[d]))
            return out
        for i in np.nonzero(owned_h)[0]:
            k = int(ks_h[i])
            if k not in self.frames and k < self.cfg.pid_max:
                self.frames[k] = eq_h[i]
                out.append((k, eq_h[i]))
        return out

    # ------------------------------------------------------------------ #
    def _assemble(self, frames: Dict[int, np.ndarray]):
        cfg = self.cfg
        rx_sig = np.zeros(
            (self.S, cfg.pid_max * self.m_occ), np.complex64
        )
        for k, f in frames.items():
            rx_sig[:, k * self.m_occ : (k + 1) * self.m_occ] = np.asarray(f)
        # upload as f32 planes and build the complex input inside the
        # jit: a direct host->device complex64 upload intermittently
        # fails (and poisons the array) on the axon attachment
        demap = jax.jit(
            lambda re, im: constellation.demodulate(
                jax.lax.complex(re, im), cfg.modulation
            )
        )
        rx_data = np.asarray(
            to_host(
                demap(jnp.asarray(rx_sig.real.astype(np.float32)),
                      jnp.asarray(rx_sig.imag.astype(np.float32)))
            )
        )
        return rx_sig, rx_data

    def result(self):
        """Assemble (rx_sig, rx_data) for the FIRST burst (the reference's
        one-burst-per-run semantics, mimo/main.cc:906-922).  A completed
        burst re-arms the decoder, so read the snapshot when present;
        otherwise the burst is still in progress and the live frames
        apply."""
        if self.bursts:
            return self._assemble(self.bursts[0].frames)
        return self._assemble(self.frames)

    def burst_results(self):
        """All bursts decoded so far as a list of
        (sync_index, rx_sig, rx_data), completed bursts first, plus the
        in-progress burst if it has emitted frames."""
        out = []
        for b in self.bursts:
            rx_sig, rx_data = self._assemble(b.frames)
            out.append((b.sync_index, rx_sig, rx_data))
        if self.frames and self._cur_sync_index is not None:
            rx_sig, rx_data = self._assemble(self.frames)
            out.append((int(self._cur_sync_index), rx_sig, rx_data))
        return out


def decode_stream(
    capture,
    cfg: ModemConfig,
    chunk_size: int = 1 << 16,
):
    """Convenience: run the streaming decoder over a full capture array,
    padding the final partial chunk with zeros."""
    dec = StreamingDecoder(cfg, chunk_size)
    cap = np.asarray(capture)
    T = cap.shape[-1]
    nc = -(-T // chunk_size)
    padded = np.pad(cap, ((0, 0), (0, nc * chunk_size - T)))
    for i in range(nc):
        dec.push(padded[:, i * chunk_size : (i + 1) * chunk_size])
    return dec
