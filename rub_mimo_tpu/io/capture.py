"""File/stream IQ ingest: the reference's binary log formats + manifests.

Replaces the live UHD radio path with file replay (the reference's default
RX path is already record-then-replay: rx_worker logs raw IQ to
/tmp/rx{1,2}.dat and re-reads the whole capture for offline decode,
mimo/main.cc:882-887, 906-922).  Formats, per mimo/apps/plot.py:27-40 and
the fwrite call sites:

  raw IQ         : complex64 little-endian   (tx{n}.dat, rx{n}.dat)
  symbol streams : complex64                 (tx_sig{n}.dat, rx_sig{n}.dat)
  data streams   : uint32                    (tx_data{n}.dat, rx_data{n}.dat)
  sync metric    : float32                   (f_sc_{n}.dat)
  corr traces    : float32                   (corr_<chan>_<ac>.dat)

The JSON manifest is the successor of the GUI's device-config store
(Interface/usrp_device.cpp:11-50, mainwindow.cpp:106-149): it records the
radio/OFDM parameters a capture was made with so replays are
self-describing.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from rub_mimo_tpu.config import ModemConfig


def read_iq(path: str | os.PathLike, count: int = -1, offset: int = 0) -> np.ndarray:
    """Read a complex64 raw-IQ .dat file (the reference's rx{n}.dat)."""
    return np.fromfile(path, dtype=np.complex64, count=count, offset=offset * 8)


def write_iq(path: str | os.PathLike, x: np.ndarray) -> None:
    np.asarray(x, dtype=np.complex64).tofile(path)


def read_data(path: str | os.PathLike, count: int = -1) -> np.ndarray:
    """Read a uint32 symbol-index file (tx_data{n}.dat / rx_data{n}.dat)."""
    return np.fromfile(path, dtype=np.uint32, count=count)


def write_data(path: str | os.PathLike, d: np.ndarray) -> None:
    np.asarray(d, dtype=np.uint32).tofile(path)


def read_metric(path: str | os.PathLike, count: int = -1) -> np.ndarray:
    """Read a float32 trace file (f_sc_{n}.dat / corr_*.dat)."""
    return np.fromfile(path, dtype=np.float32, count=count)


def write_metric(path: str | os.PathLike, m: np.ndarray) -> None:
    np.asarray(m, dtype=np.float32).tofile(path)


def read_capture(
    directory: str | os.PathLike,
    num_streams: int,
    prefix: str = "rx",
    wire_format: str = "fc32",
) -> np.ndarray:
    """Load per-stream IQ files <prefix>{1..n}.dat into [streams, T].

    wire_format: "fc32" (the reference's CPU format, complex64 on disk) or
    "sc16" (UHD's wire format, interleaved int16 — converted through the
    native ingest library).  Streams are truncated to the shortest file,
    matching how the reference consumes equal-length per-channel buffers.
    """
    directory = Path(directory)
    if wire_format == "fc32":
        chans = [
            read_iq(directory / f"{prefix}{i + 1}.dat")
            for i in range(num_streams)
        ]
    elif wire_format == "sc16":
        from rub_mimo_tpu.io import native

        chans = [
            native.sc16_to_fc32(
                np.fromfile(directory / f"{prefix}{i + 1}.dat", dtype=np.int16)
            )
            for i in range(num_streams)
        ]
    else:  # pragma: no cover
        raise ValueError(f"unknown wire_format {wire_format!r}")
    n = min(len(c) for c in chans)
    return np.stack([c[:n] for c in chans])


def write_capture(
    directory: str | os.PathLike,
    x: np.ndarray,
    prefix: str = "rx",
    wire_format: str = "fc32",
) -> None:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    for i, chan in enumerate(np.asarray(x)):
        if wire_format == "fc32":
            write_iq(directory / f"{prefix}{i + 1}.dat", chan)
        elif wire_format == "sc16":
            from rub_mimo_tpu.io import native

            native.fc32_to_sc16(chan).tofile(
                directory / f"{prefix}{i + 1}.dat"
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown wire_format {wire_format!r}")


@dataclasses.dataclass
class CaptureManifest:
    """Self-describing capture metadata (successor of dev_config.json)."""

    config: ModemConfig
    num_samples: int
    prefix: str = "rx"
    description: str = ""
    device: Dict[str, str] = dataclasses.field(default_factory=dict)
    # e.g. {"type": "b200", "serial": "308F965", "addr": "", "product": "B210"}
    # mirroring usrp_device's parsed fields (Interface/usrp_device.h:30-36)

    def save(self, path: str | os.PathLike) -> None:
        d = {
            "config": json.loads(self.config.to_json()),
            "num_samples": self.num_samples,
            "prefix": self.prefix,
            "description": self.description,
            "device": self.device,
        }
        Path(path).write_text(json.dumps(d, indent=2))

    @classmethod
    def load(cls, path: str | os.PathLike) -> "CaptureManifest":
        d = json.loads(Path(path).read_text())
        return cls(
            config=ModemConfig.from_json(json.dumps(d["config"])),
            num_samples=d["num_samples"],
            prefix=d.get("prefix", "rx"),
            description=d.get("description", ""),
            device=d.get("device", {}),
        )


def validate_capture(x: np.ndarray, min_len: Optional[int] = None) -> Dict[str, bool]:
    """Ingest-layer failure detection (truncated / NaN / silent captures).

    The reference has no such checks — a bad capture simply never syncs and
    the program decodes nothing (SURVEY §5 failure-detection).  Returns a
    dict of named checks; callers can raise or report.
    """
    x = np.asarray(x)
    checks = {
        "finite": bool(np.isfinite(x.view(np.float32)).all()),
        "nonempty": x.size > 0,
        "nonzero": bool(np.abs(x).max() > 0) if x.size else False,
    }
    if min_len is not None:
        checks["long_enough"] = x.shape[-1] >= min_len
    return checks
