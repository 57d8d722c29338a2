"""Named system presets — one per BASELINE.json configuration.

These are the "model families" of the framework: ready-made ModemConfigs
(plus matching channel specs for synthetic runs) covering every config the
baseline calls out, from the 1x1 SISO loopback to the 4x4 wideband
stretch goal.
"""

from __future__ import annotations

from typing import Dict, Tuple

from rub_mimo_tpu.config import CommMode, Detector, ModemConfig, Modulation
from rub_mimo_tpu.io.simulator import ChannelSpec


def siso_loopback(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """Config 1: 1x1 SISO OFDM loopback — QPSK through AWGN."""
    cfg = ModemConfig(
        num_streams=1,
        mode=CommMode.SISO,
        siso_tx=0,
        siso_rx=0,
        modulation=Modulation.QPSK,
        bit_exact=False,
        **kw,
    )
    spec = ChannelSpec(snr_db=25.0, delay=4096, identity=True, seed=1)
    return cfg, spec


def siso_capture(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """Config 2: 1x1 OFDM over a recorded capture — sync + CFO + LS."""
    cfg = ModemConfig(
        num_streams=1,
        mode=CommMode.SISO,
        siso_tx=0,
        siso_rx=0,
        modulation=Modulation.QPSK,
        correct_cfo=True,
        bit_exact=False,
        **kw,
    )
    spec = ChannelSpec(snr_db=25.0, delay=4096, cfo_subcarriers=0.05, seed=2)
    return cfg, spec


def mimo_2x2_zf(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """Config 3: 2x2 MIMO-OFDM, pilot channel estimation + ZF, 16-QAM."""
    cfg = ModemConfig(
        modulation=Modulation.QAM16,
        detector=Detector.ZF,
        bit_exact=False,
        **kw,
    )
    spec = ChannelSpec(snr_db=30.0, delay=5000, seed=3)
    return cfg, spec


def mimo_2x2_reference(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """The reference's exact default build: ARB32-class 32-ary modem,
    bit-exact estimator quirks (mimo/config.h defaults)."""
    cfg = ModemConfig(bit_exact=True, **kw)
    spec = ChannelSpec(snr_db=30.0, delay=5000, seed=4)
    return cfg, spec


def mimo_2x2_mmse(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """Config 4: 2x2 MIMO-OFDM with MMSE detection, long stream."""
    cfg = ModemConfig(
        modulation=Modulation.QAM16,
        detector=Detector.MMSE,
        mmse_noise_var=1e-3,
        bit_exact=False,
        **kw,
    )
    spec = ChannelSpec(snr_db=25.0, delay=5000, seed=5)
    return cfg, spec


def mimo_4x4_wideband(**kw) -> Tuple[ModemConfig, ChannelSpec]:
    """Config 5 (stretch): 4x4 MIMO wideband — batched 4x4 solves over all
    subcarriers, auto-extended preamble polynomial set."""
    cfg = ModemConfig(
        num_streams=4,
        modulation=Modulation.QAM16,
        detector=Detector.MMSE,
        mmse_noise_var=1e-3,
        bit_exact=False,
        # with 4 rx streams the all-streams plateau condition gets fragile
        # (the weakest rx<-tx0 link gates acquisition); keep the S0
        # matched-filter fallback armed
        sync_fallback=True,
        **kw,
    )
    spec = ChannelSpec(snr_db=35.0, delay=5000, seed=6,
                       diagonal_dominance=3.0)
    return cfg, spec


PRESETS: Dict[str, callable] = {
    "siso_loopback": siso_loopback,
    "siso_capture": siso_capture,
    "mimo_2x2_zf": mimo_2x2_zf,
    "mimo_2x2_reference": mimo_2x2_reference,
    "mimo_2x2_mmse": mimo_2x2_mmse,
    "mimo_4x4_wideband": mimo_4x4_wideband,
}


def get(name: str, **kw) -> Tuple[ModemConfig, ChannelSpec]:
    return PRESETS[name](**kw)
