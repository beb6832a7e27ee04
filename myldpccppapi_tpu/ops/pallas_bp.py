"""Fused Pallas TPU decoder kernels (placeholder — implemented later this
round; the jnp/XLA path in ops/bp.py is the portable implementation)."""
from __future__ import annotations

__all__ = ["supported", "decode_qc_pallas"]


def supported(code) -> bool:
    return False


def decode_qc_pallas(code, cfg, llr):
    raise NotImplementedError("Pallas decoder kernels not yet available")
