from rub_mimo_tpu.sync import matched_filter, schmidl_cox

__all__ = ["matched_filter", "schmidl_cox"]
