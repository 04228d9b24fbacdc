"""NumPy tile kernels (checksum, resample, scanline fill) run inside Arrow UDFs."""
