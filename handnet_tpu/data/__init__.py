from handnet_tpu.data import rle as rle  # noqa: F401
