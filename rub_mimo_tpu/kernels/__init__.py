from rub_mimo_tpu.kernels import sc_metric

__all__ = ["sc_metric"]
