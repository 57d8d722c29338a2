"""Debug artifact dumps in the reference's /tmp layout.

The reference logs every buffer at every stage to binary files consumed by
mimo/apps/plot.py (SURVEY §4): tx/rx raw IQ, tx/rx symbol streams, tx/rx
data streams, the per-stream S&C metric trace (f_sc_<n>.dat,
framing.cc:598-600) and the per-(chan, sequence) matched-filter correlation
traces (corr_<chan>_<ac>.dat, framing.cc:874-881).  This module writes the
same artifact set from a DecodeResult so existing plot.py-style tooling
(and our apps.analyze) can inspect a run.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.io import capture as capio
from rub_mimo_tpu.pipeline.rx import DecodeResult
from rub_mimo_tpu.utils.transfer import to_host


def dump(
    directory: str | os.PathLike,
    cfg: ModemConfig,
    result: DecodeResult,
    iq: Optional[np.ndarray] = None,
    tx_data: Optional[np.ndarray] = None,
    tx_sig: Optional[np.ndarray] = None,
) -> None:
    """Write the reference's artifact files (1-indexed stream suffixes)."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    S = cfg.num_streams

    if iq is not None:
        capio.write_capture(d, np.asarray(iq), prefix="rx")
    if tx_data is not None:
        for s in range(S):
            capio.write_data(d / f"tx_data{s + 1}.dat", np.asarray(tx_data)[s])
    if tx_sig is not None:
        for s in range(S):
            capio.write_iq(d / f"tx_sig{s + 1}.dat", np.asarray(tx_sig)[s])

    rx_sig = to_host(result.rx_sig)
    rx_data = to_host(result.rx_data)
    for s in range(S):
        capio.write_iq(d / f"rx_sig{s + 1}.dat", rx_sig[s])
        capio.write_data(d / f"rx_data{s + 1}.dat", rx_data[s])

    if result.metric is not None:
        m = to_host(result.metric)
        for s in range(S):
            capio.write_metric(d / f"f_sc_{s + 1}.dat", m[s])

    if result.mf_traces is not None:
        # traces: [streams, 1 + codes*streams, symbol_len]; the reference
        # numbers S0 as ac suffix 0 and access codes 1..codes*streams
        tr = to_host(result.mf_traces)
        for s in range(S):
            for q in range(tr.shape[1]):
                capio.write_metric(d / f"corr_{s + 1}_{q}.dat", tr[s, q])
