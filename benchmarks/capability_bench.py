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
    if args.only:
        configs = [args.only]

    rc = 0
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
