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

from .gf2 import gf2_inv, gf2_matmul, gf2_rref
from .qc import QCCode

__all__ = [
    "EncoderMatrices",
    "ru_precompute",
    "generic_precompute",
    "Encoder",
    "encode_numpy",
]


@dataclasses.dataclass(frozen=True, eq=False)
class EncoderMatrices:
    """Dense GF(2) parity generator: parity = W @ info (bools, [m, k]).

    For non-systematic codes (``perm is not None``) the codeword is
    ``c[info_cols] = u, c[parity_cols] = W @ u`` — ``perm`` is the length-n
    position array ``concat([info_cols, parity_cols])`` such that
    ``c[perm] = concat([u, parity])``.
    """

    w: np.ndarray  # [n_parity, k] bool
    gap: int       # the RU gap g (z), or 0 if a fallback was used
    perm: "np.ndarray | None" = None  # [n] int64, None = systematic identity


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
    residual = h[:, :k] ^ gf2_matmul(h[:, k:], w)
    if residual.any():
        raise AssertionError("encoder precompute failed: H @ G != 0")
    return EncoderMatrices(w=w, gap=gap)


def generic_precompute(h: np.ndarray, code_k: "int | None" = None) -> EncoderMatrices:
    """Information-set encoder for an arbitrary (even rank-deficient) H.

    Row-reduces H over GF(2); pivot columns become parity positions and the
    remaining ``n - rank`` columns carry information.  The row space — hence
    the codebook — is unchanged.  This covers code families whose parity
    block is singular (e.g. fully regular QC codes) where the RU split
    (``MyLdpc.cpp:142-147``) cannot apply.
    """
    h = np.asarray(h, dtype=np.bool_)
    n = h.shape[1]
    rref, pivot_cols = gf2_rref(h)
    info_cols = np.setdiff1d(np.arange(n, dtype=np.int64), pivot_cols)
    # row r of rref: c[pivot_r] = sum over free cols of rref[r, free] * c_free
    w = rref[:, info_cols]  # [rank, k_eff]
    perm = np.concatenate([info_cols, pivot_cols])
    return EncoderMatrices(w=w, gap=0, perm=perm)


def _scatter(perm: np.ndarray, stacked: np.ndarray) -> np.ndarray:
    """c[perm] = stacked along the last axis (numpy)."""
    c = np.empty_like(stacked)
    c[..., perm] = stacked
    return c


def encode_numpy(mats: EncoderMatrices, info_bits: np.ndarray) -> np.ndarray:
    """Reference-path numpy encode: info_bits [..., k] 0/1 -> [..., n]."""
    info_bits = np.asarray(info_bits)
    parity = (info_bits.astype(np.int64) @ mats.w.T.astype(np.int64)) % 2
    stacked = np.concatenate([info_bits, parity.astype(info_bits.dtype)], axis=-1)
    if mats.perm is None:
        return stacked
    return _scatter(mats.perm, stacked)


class Encoder:
    """Batched systematic encoder: [B, k] info bits -> [B, n] codeword bits.

    The matmul runs in int8 with int32 accumulation (exact for k < 2^23),
    mapping onto the TPU MXU.
    """

    def __init__(self, code: QCCode, mats: EncoderMatrices | None = None):
        self.code = code
        if mats is None:
            mats = getattr(code, "encoder_matrices", None)
        if mats is None:
            if getattr(code, "info_cols", None) is not None:
                mats = generic_precompute(code.h_dense())
            else:
                mats = ru_precompute(code)
        self.mats = mats
        self.k = self.mats.w.shape[1]
        self._wt = jnp.asarray(self.mats.w.T, dtype=jnp.int8)  # [k, n_parity]
        # inverse permutation as a gather (XLA-friendly): c = stacked[inv_perm]
        if self.mats.perm is not None:
            inv = np.empty(len(self.mats.perm), dtype=np.int64)
            inv[self.mats.perm] = np.arange(len(self.mats.perm))
            self._inv_perm = jnp.asarray(inv)
        else:
            self._inv_perm = None
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
        stacked = jnp.concatenate([info_bits, parity], axis=-1)
        if self._inv_perm is None:
            return stacked
        return stacked[..., self._inv_perm]

    def __call__(self, info_bits: jax.Array) -> jax.Array:
        if info_bits.shape[-1] != self.k:
            raise ValueError(
                f"expected info length {self.k}, got {info_bits.shape[-1]}"
            )
        return self._encode(info_bits)
