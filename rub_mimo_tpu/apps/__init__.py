from rub_mimo_tpu.apps import analyze, cli

__all__ = ["analyze", "cli"]
