from rub_mimo_tpu.ofdm import constellation, framegen, lfsr, preamble, sctype

__all__ = ["constellation", "framegen", "lfsr", "preamble", "sctype"]
