"""On-chip capability benchmark: timed, SER-gated decode of the
non-flagship configurations a skeptic would probe first (VERDICT r3
item 4) — bit-exact mode at the FULL reference operating point and the
4x4 wideband preset — on the attached TPU.

bench.py times the flagship robust-mode 2x2; the 12-row capability
matrix (benchmarks/capability_matrix.py) checks correctness on the CPU
mesh.  This bridges the two: full-size decodes of the reference-quirk
(bit_exact=True: identity-biased Ghat, per-code timing argmax,
framing.cc:302-319) and 4x4 configurations, each measured with the same
sustained fetch-backed-barrier methodology as bench.py and gated on its
symbol error rate.

  python benchmarks/capability_bench.py [--frames N] [--iters K] [--cpu]

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="run a single named config")
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/rub_mimo_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.models import presets
    from rub_mimo_tpu.pipeline import rx
    from rub_mimo_tpu.utils.transfer import to_host

    sum_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def hard_sync(arr):
        return float(np.asarray(to_host(sum_fn(arr))))

    configs = ["mimo_2x2_reference", "mimo_4x4_wideband"]
    extra = ["fec_2x2_conv_k7", "ml_2x2_arb32", "sfo_2x2_100ppm"]
    if args.only:
        configs = [args.only] if args.only not in extra else []
        extra = [args.only] if args.only in extra else []
    rc = 0

    # ---- full-size FEC / ML / SFO capability rows (VERDICT r4 item 5):
    # the three headline capability claims, each timed + error-gated at
    # the reference operating point ----
    from rub_mimo_tpu.config import Detector, ModemConfig

    for name in extra:
        if name == "fec_2x2_conv_k7":
            # rate-1/2 K=7 convolutional payload over the full 2x2 run;
            # gate on CODED BER after Viterbi
            from rub_mimo_tpu.ofdm import fec

            cfg = ModemConfig(pid_max=args.frames, bit_exact=False)
            spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42)
            msg, txd = fec.encode_payload(cfg, seed=1)
            capture, tx_data, _ = simulator.simulate_capture(
                cfg, spec, tx_data=txd, payload_seed=1)
            capture = jax.device_put(jnp.asarray(capture))
            S, T = capture.shape
            dec = rx.make_decoder(cfg)
            vit = jax.jit(lambda sig: fec.decode_payload(sig, cfg))

            def step():
                r = dec(capture)
                return vit(r.rx_sig)

            t0 = time.perf_counter()
            bits = step()
            hard_sync(bits)
            compile_s = time.perf_counter() - t0
            n_iter = max(args.iters, 10)
            t0 = time.perf_counter()
            for _ in range(n_iter):
                bits = step()
            hard_sync(bits)
            sustained_ms = (time.perf_counter() - t0) / n_iter * 1e3
            dec_bits = np.asarray(to_host(bits))
            cber = float((dec_bits != np.asarray(msg)).mean())
            line = {
                "metric": "capability_fec_2x2_conv_k7",
                "value": round(S * T / (sustained_ms / 1e3), 1),
                "unit": "IQ samples/s/chip (sustained, decode+viterbi)",
                "sustained_ms": round(sustained_ms, 4),
                "compile_s": round(compile_s, 1),
                "samples": int(T),
                "info_bits": int(np.asarray(msg).size),
                "coded_ber": cber,
            }
            print(json.dumps(line), flush=True)
            if cber > 0.0:
                rc = 1
        elif name == "ml_2x2_arb32":
            # joint max-likelihood lattice detector, 32-ary 2x2 (1024
            # hypotheses per subcarrier), full run
            cfg = ModemConfig(pid_max=args.frames, bit_exact=False,
                              detector=Detector.ML)
            spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42)
            capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
            capture = jax.device_put(jnp.asarray(capture))
            S, T = capture.shape
            dec = rx.make_decoder(cfg)
            t0 = time.perf_counter()
            result = dec(capture)
            hard_sync(result.rx_data)
            compile_s = time.perf_counter() - t0
            n_iter = max(args.iters, 10)
            t0 = time.perf_counter()
            for _ in range(n_iter):
                last = dec(capture)
            hard_sync(last.rx_data)
            sustained_ms = (time.perf_counter() - t0) / n_iter * 1e3
            n = cfg.pid_max * cfg.M_occupied
            rxd = np.asarray(to_host(result.rx_data))
            errs = int((rxd[:, :n] != np.asarray(tx_data)[:, :n]).sum())
            ser = 100.0 * errs / (cfg.num_streams * n)
            line = {
                "metric": "capability_ml_2x2_arb32",
                "value": round(S * T / (sustained_ms / 1e3), 1),
                "unit": "IQ samples/s/chip (sustained)",
                "sustained_ms": round(sustained_ms, 4),
                "compile_s": round(compile_s, 1),
                "samples": int(T),
                "symbols": cfg.num_streams * n,
                "ser_percent": round(ser, 4),
            }
            print(json.dumps(line), flush=True)
            if ser > 0.5:
                rc = 1
        elif name == "sfo_2x2_100ppm":
            # 100 ppm sampling-frequency offset over the full capture:
            # two-pass estimate+resample+decode (estimate.sfo); wall-
            # clock timed (the flow host-syncs between passes)
            import dataclasses as _dc

            from rub_mimo_tpu.estimate import sfo as sfo_mod

            cfg = ModemConfig(pid_max=args.frames, bit_exact=False)
            spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42,
                                         sfo_ppm=100.0)
            capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
            capture = jax.device_put(jnp.asarray(capture))
            S, T = capture.shape
            t0 = time.perf_counter()
            result, delta, _ = sfo_mod.decode_with_sfo(capture, cfg)
            hard_sync(result.rx_data)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                result, delta, _ = sfo_mod.decode_with_sfo(capture, cfg)
                hard_sync(result.rx_data)
                walls.append(time.perf_counter() - t0)
            wall_ms = sorted(walls)[len(walls) // 2] * 1e3
            n = cfg.pid_max * cfg.M_occupied
            rxd = np.asarray(to_host(result.rx_data))
            errs = int((rxd[:, :n] != np.asarray(tx_data)[:, :n]).sum())
            ser = 100.0 * errs / (cfg.num_streams * n)
            line = {
                "metric": "capability_sfo_2x2_100ppm",
                "value": round(S * T / (wall_ms / 1e3), 1),
                "unit": "IQ samples/s/chip (wall, 2-pass est+resample)",
                "wall_ms": round(wall_ms, 3),
                "compile_s": round(compile_s, 1),
                "samples": int(T),
                "sfo_ppm_true": 100.0,
                "sfo_ppm_hat": round(float(np.asarray(to_host(
                    jnp.asarray(delta, jnp.float32)))) * 1e6, 3),
                "ser_percent": round(ser, 4),
            }
            print(json.dumps(line), flush=True)
            if ser > 0.5:
                rc = 1

    for name in configs:
        cfg, spec = presets.get(name, pid_max=args.frames)
        capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
        capture = jax.device_put(jnp.asarray(capture))
        S, T = capture.shape
        dec = rx.make_decoder(cfg)

        t0 = time.perf_counter()
        result = dec(capture)
        hard_sync(result.rx_data)
        compile_s = time.perf_counter() - t0

        n_iter = max(args.iters, 10)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            last = dec(capture)
        hard_sync(last.rx_data)
        sustained_ms = (time.perf_counter() - t0) / n_iter * 1e3

        n = cfg.pid_max * cfg.M_occupied
        rxd = np.asarray(to_host(result.rx_data))
        errs = int((rxd[:, :n] != np.asarray(tx_data)[:, :n]).sum())
        ser = 100.0 * errs / (cfg.num_streams * n)
        sps = S * T / (sustained_ms / 1e3)
        line = {
            "metric": f"capability_{name}",
            "value": round(sps, 1),
            "unit": "IQ samples/s/chip (sustained)",
            "sustained_ms": round(sustained_ms, 4),
            "compile_s": round(compile_s, 1),
            "streams": S,
            "samples": int(T),
            "symbols": cfg.num_streams * n,
            "ser_percent": round(ser, 4),
            "bit_exact": cfg.bit_exact,
            "synced": bool(hard_sync(result.synced.astype(jnp.int32))),
        }
        print(json.dumps(line), flush=True)
        if ser > 0.5 or not line["synced"]:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
