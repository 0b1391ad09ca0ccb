"""Pallas TPU kernels for the hot encode/decode paths."""
