"""Pallas TPU kernels for the hot ops (north-star: fused InfoNCE + memory
scatter). Each kernel has an XLA fallback; kernels run in interpret mode on
CPU for CI."""
