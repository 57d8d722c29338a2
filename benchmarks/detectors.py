"""Detector shoot-out: ZF / MMSE / SIC / ML on the same captures.

One JSON line per (detector, snr): max per-stream SER and decode wall
time.  ML is skipped automatically when arity**streams exceeds its
combo cap (use SIC there — that is its regime).

  python benchmarks/detectors.py --tiny --cpu --snrs 10 14 18
  python benchmarks/detectors.py --streams 4 --modulation qam64 --tiny --cpu
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
    ap.add_argument("--snrs", type=float, nargs="+", default=[12, 18, 24])
    ap.add_argument("--streams", type=int, default=2)
    ap.add_argument("--modulation", default="qam16")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from rub_mimo_tpu.config import (
        Detector, ModemConfig, Modulation, tiny_config,
    )
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import report, rx

    def make_cfg(det):
        kw = dict(
            bit_exact=False, num_streams=args.streams,
            modulation=Modulation(args.modulation), pid_max=args.frames,
            sync_fallback=True, detector=det, mmse_noise_var=1e-3,
        )
        return tiny_config(**kw) if args.tiny else ModemConfig(**kw)

    detectors = [Detector.ZF, Detector.MMSE, Detector.SIC, Detector.ML]
    for snr in args.snrs:
        spec = simulator.ChannelSpec(
            snr_db=snr, delay=300, seed=args.seed,
            diagonal_dominance=1.5,
        )
        cap, tx_data, _ = simulator.simulate_capture(
            make_cfg(Detector.ZF), spec
        )
        for det in detectors:
            cfg = make_cfg(det)
            try:
                cfg.validate()
            except ValueError as e:
                print(json.dumps({"detector": det.value, "snr_db": snr,
                                  "skipped": str(e)}))
                continue
            dec = rx.make_decoder(cfg)
            r = dec(cap)
            jax.block_until_ready(r.rx_data)
            t0 = time.perf_counter()
            r = dec(cap)
            jax.block_until_ready(r.rx_data)
            dt = time.perf_counter() - t0
            rep = report.score(r, tx_data, cfg)
            print(json.dumps({
                "detector": det.value,
                "snr_db": snr,
                "synced": bool(rep.synced),
                "max_ser_pct": max(rep.symbol_error_rate),
                "decode_ms": round(dt * 1e3, 3),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
