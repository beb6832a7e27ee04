"""Compute ops: channel simulation, modulation, bit packing, BP decoders,
Pallas kernels."""
from . import bp, bp_edgelist, channel, golden, modulation, packing

__all__ = ["bp", "bp_edgelist", "channel", "golden", "modulation", "packing"]
