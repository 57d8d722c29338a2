from rub_mimo_tpu.utils import movsum

__all__ = ["movsum"]
