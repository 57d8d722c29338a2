#!/usr/bin/env python3
"""Dump liquid-dsp's exact ARB32OPT constellation to a table file.

Run this on any machine with liquid-dsp installed (the reference links
against it, mimo/makefile:11; this repo's build environment does not
ship it and has no network egress, so the exact floats cannot be
vendored — they must be extracted from a real liquid build):

    python scripts/extract_liquid_arb32opt.py -o arb32opt_liquid.json

Then decode liquid-recorded captures symbol-exactly with:

    python -m rub_mimo_tpu.apps.cli decode <dir> --arb32opt-table arb32opt_liquid.json

or programmatically via ofdm.constellation.load_arb32opt_table(path).
If liquid is installed on THIS machine the CLI flag
``--arb32opt-from-liquid`` extracts + installs in-process instead.
"""

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="arb32opt_liquid.json")
    ap.add_argument("--lib", default=None,
                    help="explicit path to libliquid.so")
    ap.add_argument("--scheme", default="arb32opt")
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
    from rub_mimo_tpu.ofdm.liquid_tables import (
        LiquidNotFound, extract_modem_table,
    )

    try:
        pts = extract_modem_table(args.scheme, args.lib)
    except LiquidNotFound as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    with open(args.out, "w") as f:
        json.dump([[float(p.real), float(p.imag)] for p in pts], f,
                  indent=1)
        f.write("\n")
    print(f"wrote {len(pts)} exact {args.scheme} points to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
