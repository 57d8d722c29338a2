from rub_mimo_tpu.detect import diversity, mmse, precode, siso, zf

__all__ = ["diversity", "mmse", "precode", "siso", "zf"]
