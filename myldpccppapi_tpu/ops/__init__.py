"""Compute ops: channel simulation, bit packing, BP decoders, Pallas kernels."""
from . import bp, bp_edgelist, channel, golden, packing

__all__ = ["bp", "bp_edgelist", "channel", "golden", "packing"]
