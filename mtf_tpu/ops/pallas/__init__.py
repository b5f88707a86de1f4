"""Pallas TPU kernels for the hot ops."""
from mtf_tpu.ops.pallas.lk_fused import (  # noqa: F401
    lk_fused_chain, lk_fused_gn_t)
