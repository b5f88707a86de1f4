"""Pallas TPU kernels for the hot ops."""
from mtf_tpu.ops.pallas.dense_sample import sample_dense_pallas  # noqa: F401
