from rub_mimo_tpu.utils import movsum, profiling, transfer

__all__ = ["movsum", "profiling", "transfer"]
