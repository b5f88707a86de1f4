"""Pallas TPU kernels for the hot ops."""
from mtf_tpu.ops.pallas.dense_sample import (  # noqa: F401
    sample_dense_pallas, sample_dense_pallas_parts)
