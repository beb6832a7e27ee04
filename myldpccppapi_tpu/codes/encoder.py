"""Systematic LDPC encoding.

Host-side one-time precompute uses the Richardson-Urbanke approximate-lower-
triangular split H = [A B T; C D E] with gap g = z — the same decomposition as
the reference's ``Coder::forEncoder`` (``MyLdpc.cpp:137-165``) — to build a
dense GF(2) parity generator W with p = W @ s.

The batched runtime encode is TPU-native: one int8 matmul on the MXU followed
by a mod-2, instead of the reference's per-codeword Eigen sparse GEMVs
(``Coder::encodeOnce``, ``MyLdpc.cpp:633-682``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .gf2 import gf2_inv, gf2_matmul
from .qc import QCCode

__all__ = ["EncoderMatrices", "ru_precompute", "Encoder", "encode_numpy"]


@dataclasses.dataclass(frozen=True, eq=False)
class EncoderMatrices:
    """Dense GF(2) parity generator: parity = W @ info (bools, [m, k])."""

    w: np.ndarray  # [m, k] bool
    gap: int       # the RU gap g (z), or 0 if the full-inverse fallback was used


def ru_precompute(code: QCCode) -> EncoderMatrices:
    """Richardson-Urbanke precompute with gap g = z.

    Splits H into [A B T; C D E] (T lower-triangular (m-g) x (m-g)), then
      p1 = phi^-1 (E T^-1 A + C) s          with phi = E T^-1 B + D
      p2 = T^-1 (A s + B p1)
    and stacks W = [W1; W2] so that parity = W @ s.  Falls back to the full
    inverse W = H_p^-1 H_s if the ALT split is singular for this code.
    """
    h = code.h_dense()
    m, n = h.shape
    k = n - m
    g = code.z
    try:
        a = h[: m - g, :k]
        b = h[: m - g, k : k + g]
        c = h[m - g :, :k]
        d = h[m - g :, k : k + g]
        t = h[: m - g, k + g :]
        e = h[m - g :, k + g :]
        inv_t = gf2_inv(t)
        e_inv_t = gf2_matmul(e, inv_t)
        phi = gf2_matmul(e_inv_t, b) ^ d
        w1 = gf2_matmul(gf2_inv(phi), gf2_matmul(e_inv_t, a) ^ c)  # [g, k]
        w2 = gf2_matmul(inv_t, a ^ gf2_matmul(b, w1))              # [m-g, k]
        w = np.concatenate([w1, w2], axis=0)
        gap = g
    except np.linalg.LinAlgError:
        # generic systematic fallback: p = H_p^-1 H_s s
        w = gf2_matmul(gf2_inv(h[:, k:]), h[:, :k])
        gap = 0
    # sanity: H @ [s; W s] = (H_s + H_p W) s must be 0 for all s
    residual = gf2_matmul(h[:, :k], np.eye(k, dtype=np.bool_)) ^ gf2_matmul(h[:, k:], w)
    if residual.any():
        raise AssertionError("encoder precompute failed: H @ G != 0")
    return EncoderMatrices(w=w, gap=gap)


def encode_numpy(mats: EncoderMatrices, info_bits: np.ndarray) -> np.ndarray:
    """Reference-path numpy encode: info_bits [..., k] 0/1 -> [..., n]."""
    info_bits = np.asarray(info_bits)
    parity = (info_bits.astype(np.int64) @ mats.w.T.astype(np.int64)) % 2
    return np.concatenate([info_bits, parity.astype(info_bits.dtype)], axis=-1)


class Encoder:
    """Batched systematic encoder: [B, k] info bits -> [B, n] codeword bits.

    The matmul runs in int8 with int32 accumulation (exact for k < 2^23),
    mapping onto the TPU MXU.
    """

    def __init__(self, code: QCCode, mats: EncoderMatrices | None = None):
        self.code = code
        self.mats = mats if mats is not None else ru_precompute(code)
        self._wt = jnp.asarray(self.mats.w.T, dtype=jnp.int8)  # [k, m]
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, info_bits: jax.Array) -> jax.Array:
        u = info_bits.astype(jnp.int8)
        acc = jax.lax.dot_general(
            u,
            self._wt,
            dimension_numbers=(((u.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        parity = (acc & 1).astype(info_bits.dtype)
        return jnp.concatenate([info_bits, parity], axis=-1)

    def __call__(self, info_bits: jax.Array) -> jax.Array:
        if info_bits.shape[-1] != self.code.k:
            raise ValueError(
                f"expected info length {self.code.k}, got {info_bits.shape[-1]}"
            )
        return self._encode(info_bits)
