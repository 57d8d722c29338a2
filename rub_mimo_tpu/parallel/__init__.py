from rub_mimo_tpu.parallel import decode_sharded, mesh

__all__ = ["decode_sharded", "mesh"]
