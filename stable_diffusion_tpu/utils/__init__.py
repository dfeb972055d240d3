"""Interop, data, checkpointing, quantization utilities."""
