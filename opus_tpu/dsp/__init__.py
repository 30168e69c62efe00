"""Plane B: dense batched DSP kernels for TPU (JAX/XLA/Pallas).

These kernels synthesise PCM for thousands of concurrent streams per step
from the symbol planes the host entropy plane extracts: band
denormalisation, IMDCT-as-matmul (MXU), TDAC overlap, pitch post-filter,
de-emphasis (associative scan) and downsampling.
"""
