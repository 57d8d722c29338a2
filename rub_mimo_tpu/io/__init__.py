from rub_mimo_tpu.io import capture, simulator

__all__ = ["capture", "simulator"]
