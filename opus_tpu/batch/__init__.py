"""Batched serving pipeline: host entropy plane -> device DSP plane."""

from .pipeline import BatchedCeltDecoder

__all__ = ["BatchedCeltDecoder"]
