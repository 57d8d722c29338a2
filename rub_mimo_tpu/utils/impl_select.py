"""Measurement-driven implementation dispatch.

Round 2 shipped a ~70x decode regression because an "auto" dispatch
(pipeline.rx window_impl) hardcoded a branch to a Pallas kernel that had
only ever been validated in interpret mode — nothing on the TPU side
checked that the chosen path was *fast* (or even ran compiled) before it
became the default.  This module makes that structurally impossible:

  - ``bench.py --check`` runs every backend-dispatched implementation
    pair COMPILED on the attached backend, asserts output equality, and
    records per-impl device milliseconds to a committed JSON table
    (``rub_mimo_tpu/data/impl_timings.json``).
  - The ``"auto"`` dispatches (pipeline.rx window grab,
    sync.schmidl_cox sync impl, sync.matched_filter method) consult the
    table via :func:`best_impl` and pick the fastest impl that PASSED
    the equality check on this backend.  No measurement for this
    backend -> the safe fallback (the plain XLA formulation), never an
    unmeasured kernel.

The table is data, not code: regenerating it (one ``bench.py --check``
run on the attached chip) is the only way a non-fallback impl can win
an auto dispatch.
"""

from __future__ import annotations

import functools
import json
import os

_TABLE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "impl_timings.json",
)

# Safe fallbacks per dispatch point: the impl used when the committed
# table has no passing measurement for the current backend.  Always the
# plain XLA formulation — correct everywhere, never a kernel that has
# only been seen in interpret mode.
FALLBACKS = {
    "window": "xla",
    "sync": "coarse",
    "matched_filter": "xcorr",
    "cpstrip": "xla",
    "payload": "xla",
}

# Impls that change the OUTPUT CONTRACT (not just speed): never chosen
# by an "auto" dispatch — only by callers that opt in explicitly and
# know how to consume the result (see DecodeResult.payload_perm).
EXPLICIT_ONLY = {
    "payload": frozenset({"fused_packed", "fused_strip"}),
}


@functools.lru_cache(maxsize=1)
def _load_table() -> dict:
    try:
        with open(_TABLE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def reload_table() -> None:
    """Drop the cached table (after ``bench.py --check`` rewrites it)."""
    _load_table.cache_clear()


@functools.lru_cache(maxsize=64)
def best_impl(point: str, backend: str,
              include_explicit: bool = False) -> str:
    """Fastest measured-and-equal impl for a dispatch point, or the safe
    fallback when this backend has no passing measurements.

    include_explicit=True also considers the EXPLICIT_ONLY impls (layout-
    changing contracts) — for callers like bench.py that handle them."""
    fallback = FALLBACKS[point]
    entry = _load_table().get(backend, {}).get(point, {})
    excluded = () if include_explicit else EXPLICIT_ONLY.get(point, ())
    best, best_ms = fallback, None
    for impl, rec in entry.items():
        if impl in excluded:
            continue
        if not isinstance(rec, dict) or not rec.get("equal", False):
            continue
        ms = rec.get("decode_ms", rec.get("device_ms"))
        if ms is None:
            continue
        if best_ms is None or ms < best_ms:
            best, best_ms = impl, ms
    return best


def table_path() -> str:
    return _TABLE_PATH
