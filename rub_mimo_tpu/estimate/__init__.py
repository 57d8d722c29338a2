from rub_mimo_tpu.estimate import cfo, ls

__all__ = ["cfo", "ls"]
