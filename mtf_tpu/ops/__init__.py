from mtf_tpu.ops import warp, interp  # noqa: F401
