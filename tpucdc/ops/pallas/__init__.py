"""Pallas TPU kernels for the UNet hot path (SURVEY.md C3, C4)."""
