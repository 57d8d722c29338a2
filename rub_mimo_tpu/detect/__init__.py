from rub_mimo_tpu.detect import mmse, siso, zf

__all__ = ["mmse", "siso", "zf"]
