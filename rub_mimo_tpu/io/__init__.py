from rub_mimo_tpu.io import capture, devices, native, simulator

__all__ = ["capture", "devices", "native", "simulator"]
