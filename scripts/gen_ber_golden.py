"""Regenerate tests/golden/ber_curves.json — the pinned BER/SER curves.

Run after any INTENTIONAL change to the DSP chain's accuracy:
    python scripts/gen_ber_golden.py
and commit the refreshed JSON.  tests/test_ber_curves.py replays the
same deterministic sweep and asserts each point within tolerance.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.ber_points import GRID, measure_point

    out = {}
    for key, point in GRID.items():
        out[key] = {}
        for snr in point["snrs"]:
            ser = measure_point(key, snr)
            out[key][str(snr)] = ser
            print(f"{key} @ {snr} dB: SER {ser:.5f}")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "ber_curves.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
