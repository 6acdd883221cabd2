"""Pallas/Mosaic TPU kernels for the intersection hot path."""
