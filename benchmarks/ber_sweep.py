"""SER/BER vs SNR sweep — the accuracy-validation artifact.

Sweeps the synthetic channel SNR for a chosen preset and writes one JSON
document (and optional CSV) of per-stream SER/BER/EVM, with the QPSK AWGN
theory curve alongside for the SISO case.  This is the quantitative
evidence that the chain tracks theory (BASELINE config 1 acceptance).

  python benchmarks/ber_sweep.py --preset siso_loopback --snrs 6 8 10 12
  python benchmarks/ber_sweep.py --preset mimo_2x2_zf --tiny
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def qfunc(x: float) -> float:
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def qpsk_ser_theory(snr_db: float) -> float:
    esn0 = 10.0 ** (snr_db / 10.0)
    q = qfunc(math.sqrt(esn0))
    return 2 * q - q * q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="siso_loopback")
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[6, 8, 10, 12, 14, 16, 20])
    ap.add_argument("--tiny", action="store_true",
                    help="shrink to M=64 for fast CPU sweeps")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--fec", action="store_true",
                    help="also sweep the rate-1/2 K=7 coded payload "
                         "(adds a coded_ber column)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.models import presets
    from rub_mimo_tpu.pipeline import report, rx

    kw = {}
    if args.tiny:
        kw = dict(num_subcarriers=64, cp_len=16, num_access_codes=4,
                  pid_max=32)
    cfg, base_spec = presets.get(args.preset, **kw)
    # low-SNR sweeps need acquisition below the 0.95 plateau limit
    cfg = cfg.replace(plateau_threshold=0.5, sync_fallback=True)

    rows = []
    for snr in args.snrs:
        sers, bers, evms, cbers, syncs = [], [], [], [], 0
        for t in range(args.trials):
            spec = dataclasses.replace(base_spec, snr_db=snr,
                                       seed=base_spec.seed + 97 * t)
            msg = txd = None
            if args.fec:
                from rub_mimo_tpu.ofdm import fec

                msg, txd = fec.encode_payload(cfg, seed=t)
            cap, tx_data, _ = simulator.simulate_capture(
                cfg, spec, tx_data=txd, payload_seed=t
            )
            result = rx.decode(cap, cfg)
            rep = report.score(result, tx_data, cfg)
            if not rep.synced:
                continue
            syncs += 1
            sers.append(max(rep.symbol_error_rate) / 100.0)
            bers.append(max(rep.bit_error_rate))
            if rep.evm_percent:
                evms.append(max(rep.evm_percent))
            if args.fec:
                from rub_mimo_tpu.utils.transfer import to_host

                dec = to_host(fec.decode_payload(result.rx_sig, cfg))
                cbers.append(float((dec != msg).mean()))
        row = {
            "snr_db": snr,
            "sync_rate": syncs / args.trials,
            "ser": float(np.mean(sers)) if sers else None,
            "ber": float(np.mean(bers)) if bers else None,
            "evm_percent": float(np.mean(evms)) if evms else None,
        }
        if args.fec:
            row["coded_ber"] = float(np.mean(cbers)) if cbers else None
        if cfg.modulation.value == "qpsk":
            row["ser_theory_awgn"] = qpsk_ser_theory(snr)
        rows.append(row)
        print(json.dumps(row))

    doc = {"preset": args.preset, "trials": args.trials, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
