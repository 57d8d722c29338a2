from rub_mimo_tpu.models import presets

__all__ = ["presets"]
