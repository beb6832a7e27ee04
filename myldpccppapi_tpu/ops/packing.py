"""Bit <-> byte packing, LSB-first within each byte.

Preserves the reference's packing contract (encode unpack at
``MyLdpc.cpp:643-646``, decode pack kernel ``toChar`` at ``decodeCL.c:188-199``):
bit index b of byte i is bit (8*i + b) of the stream, LSB first.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["unpack_bits", "pack_bits", "unpack_bits_np", "pack_bits_np"]

_WEIGHTS = 2 ** np.arange(8, dtype=np.int32)  # LSB-first


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., L] -> uint8 bits [..., L*8], LSB-first."""
    data = data.astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 bits [..., L*8] -> uint8 [..., L], LSB-first."""
    if bits.shape[-1] % 8 != 0:
        raise ValueError("bit length must be a multiple of 8")
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.int32)
    return jnp.sum(b * jnp.asarray(_WEIGHTS), axis=-1).astype(jnp.uint8)


def unpack_bits_np(data: np.ndarray) -> np.ndarray:
    data = np.asarray(data, dtype=np.uint8)
    bits = np.unpackbits(data[..., :, None], axis=-1, bitorder="little")
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    bits = np.asarray(bits, dtype=np.uint8)
    if bits.shape[-1] % 8 != 0:
        raise ValueError("bit length must be a multiple of 8")
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8)
    return np.packbits(b, axis=-1, bitorder="little")[..., 0]
