"""Vectorized (NumPy / pandas) scalar function kernels used by the operators."""
