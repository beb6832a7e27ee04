"""Compute ops: channel simulation, bit packing, BP decoders, Pallas kernels."""
from . import bp, channel, golden, packing

__all__ = ["bp", "channel", "golden", "packing"]
