"""Convenience namespace re-exporting the numeric building blocks ("ops")."""

from rub_mimo_tpu.detect.mmse import mmse_weights
from rub_mimo_tpu.detect.zf import equalize, invert
from rub_mimo_tpu.ofdm.constellation import demodulate, modulate
from rub_mimo_tpu.sync.schmidl_cox import plateau_scan, sc_metric
from rub_mimo_tpu.utils.movsum import delay, moving_sum

__all__ = [
    "demodulate", "delay", "equalize", "invert", "mmse_weights",
    "modulate", "moving_sum", "plateau_scan", "sc_metric",
]
