from rub_mimo_tpu.estimate import ls

__all__ = ["ls"]
