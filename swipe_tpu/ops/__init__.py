"""Compute kernels: Pallas TPU Smith-Waterman kernels plus NumPy oracles."""
