"""Convenience namespace re-exporting the numeric building blocks ("ops")."""

from rub_mimo_tpu.detect.diversity import mrc_combine
from rub_mimo_tpu.detect.mmse import mmse_weights
from rub_mimo_tpu.detect.precode import effective_channel, mmse_precoder, zf_precoder
from rub_mimo_tpu.detect.zf import equalize, invert
from rub_mimo_tpu.ofdm.constellation import demodulate, modulate
from rub_mimo_tpu.sync.schmidl_cox import plateau_scan, sc_metric
from rub_mimo_tpu.utils.movsum import delay, moving_sum

__all__ = [
    "demodulate", "delay", "effective_channel", "equalize", "invert",
    "mmse_precoder", "mmse_weights", "modulate", "moving_sum",
    "mrc_combine", "plateau_scan", "sc_metric", "zf_precoder",
]
