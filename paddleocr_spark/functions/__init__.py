"""Vectorized pandas/Arrow UDF wrappers around the NumPy kernels."""
