"""Compute ops: channel simulation, modulation, bit packing, BP decoders,
Pallas kernels."""
from . import (bitflip, bp, bp_edgelist, channel, golden, impulse,
               modulation, packing)

__all__ = ["bitflip", "bp", "bp_edgelist", "channel", "golden", "impulse",
           "modulation", "packing"]
