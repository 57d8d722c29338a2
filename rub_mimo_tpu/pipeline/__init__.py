from rub_mimo_tpu.pipeline import report, rx

__all__ = ["report", "rx"]
