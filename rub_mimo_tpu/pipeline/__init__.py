from rub_mimo_tpu.pipeline import artifacts, checkpoint, report, rx, streaming

__all__ = ["artifacts", "checkpoint", "report", "rx", "streaming"]
