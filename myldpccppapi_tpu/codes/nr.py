"""5G-NR-style LDPC: BG1/BG2-structured base graphs, lifting, rate matching.

Provides the BASELINE config-4 capability: a 46x68 (BG1) / 42x52 (BG2)
protograph with 22 (resp. 10) systematic columns, the dual-diagonal core +
identity-extension parity structure of TS 38.212, lifting to any Z, the
standard 2Z front puncture, and circular-buffer rate matching with LLR
de-rate-matching (fill value 0 for untransmitted, -inf-free saturation for
the never-sent punctured bits).

The base-graph *connectivity and shift tables here are synthetic*: they are
generated deterministically with the structural properties of the standard's
BG1/BG2 (dense high-degree first two columns, degree-3 extension rows,
lower-triangular parity part) but are NOT the 3GPP tables, so this family is
not bit-interoperable with 38.212 hardware.  Everything downstream — the
lifting, encoder, rate matcher, decoder, campaign machinery — treats the
table as data, so dropping in the standard's tables is a data change only.

Encoding exploits the lower-block-triangular parity structure: one sparse
block back-substitution pass, O(edges * z), instead of any dense inverse —
the structured analogue of the reference's RU precompute (MyLdpc.cpp:137-165).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .qc import QCCode

__all__ = [
    "nr_base_graph",
    "nr_code",
    "triangular_encode_fn",
    "triangular_encode_numpy",
    "rate_match_llr",
    "rate_match_bits",
    "NR_ZMAX",
]

NR_ZMAX = 384

_BG_SHAPES = {1: (46, 68, 22), 2: (42, 52, 10)}


def nr_base_graph(bg: int = 1, zmax: int = NR_ZMAX) -> np.ndarray:
    """Synthetic BG1/BG2-structured base matrix with shifts in [0, zmax).

    Structure (matching TS 38.212's shape, not its values):
    * columns 0..k_b-1: systematic; cols 0 and 1 are high-degree (they are
      the punctured columns and need the protection),
    * cols k_b..k_b+3: core parity, lower-bidiagonal staircase (shift 0),
    * cols k_b+4..: one identity column per extension row,
    * core rows are dense over the systematic columns; extension rows have
      degree ~4 plus their identity bit.
    """
    m_b, n_b, k_b = _BG_SHAPES[bg]
    rng = np.random.default_rng(38212 + bg)
    base = np.full((m_b, n_b), -1, dtype=np.int32)

    def shift():
        return int(rng.integers(0, zmax))

    # core rows: dense over systematic columns
    for i in range(4):
        cols = set(range(0, 2)) | set(
            rng.choice(np.arange(2, k_b), size=max(k_b - 5, 2), replace=False)
        )
        for j in cols:
            base[i, j] = shift()
    # core parity staircase (shift 0 diagonals -> trivially invertible)
    for i in range(4):
        base[i, k_b + i] = 0
        if i + 1 < 4:
            base[i + 1, k_b + i] = 0
    # extension rows
    for r in range(4, m_b):
        cols = {r % 2}  # protect the punctured columns 0/1
        cols |= set(rng.choice(np.arange(2, k_b), size=3, replace=False))
        if rng.random() < 0.4:
            cols.add(int(k_b + rng.integers(0, 4)))
        for j in cols:
            base[r, j] = shift()
        base[r, k_b + 4 + (r - 4)] = 0  # identity extension column
    return base


def nr_code(z: int = 384, bg: int = 1) -> QCCode:
    """Lift the BG to size ``z``: shifts scale as ``s mod z`` (38.212 rule
    for the largest set; the per-set tables collapse onto one here)."""
    m_b, n_b, k_b = _BG_SHAPES[bg]
    raw = nr_base_graph(bg)
    base = np.where(raw >= 0, raw % z, -1).astype(np.int32)
    return QCCode(
        name=f"nr_bg{bg}_z{z}",
        base=base,
        z=z,
        punctured_front=2 * z,
    )


# ---------------------------------------------------------------------------
# Encoding: sparse block back-substitution over the triangular parity part
# ---------------------------------------------------------------------------

def _check_triangular(code: QCCode) -> None:
    k_b = code.k // code.z
    pb = code.base[:, k_b:]
    m_b = code.m_b
    for i in range(m_b):
        if pb[i, i] != 0:
            raise ValueError("parity diagonal must be shift-0 identity blocks")
        if any(pb[i, j] >= 0 for j in range(i + 1, m_b)):
            raise ValueError("parity part must be lower block triangular")


def triangular_encode_numpy(code: QCCode, u: np.ndarray) -> np.ndarray:
    """[..., k] info bits -> [..., n] codeword via block back-substitution."""
    _check_triangular(code)
    z, k_b, m_b = code.z, code.k // code.z, code.m_b
    u = np.asarray(u)
    ub = u.reshape(*u.shape[:-1], k_b, z)
    blocks = [ub[..., j, :] for j in range(k_b)]
    for i in range(m_b):
        acc = np.zeros(ub.shape[:-2] + (z,), dtype=ub.dtype)
        for j in range(k_b + i):  # strictly-lower parity + all info blocks
            s = code.base[i, j]
            if s >= 0:
                acc = acc ^ np.roll(blocks[j], -s, axis=-1)
        blocks.append(acc)  # p_i: diagonal block is identity (shift 0)
    return np.concatenate(blocks, axis=-1)


def triangular_encode_fn(code: QCCode):
    """jnp version of :func:`triangular_encode_numpy` (jit/shard-safe)."""
    _check_triangular(code)
    z, k_b, m_b = code.z, code.k // code.z, code.m_b
    entries = [
        [(j, int(code.base[i, j])) for j in range(k_b + i) if code.base[i, j] >= 0]
        for i in range(m_b)
    ]

    def encode(u: jax.Array) -> jax.Array:
        ub = u.reshape(*u.shape[:-1], k_b, z).astype(jnp.int32)
        blocks = [ub[..., j, :] for j in range(k_b)]
        for i in range(m_b):
            acc = jnp.zeros(u.shape[:-1] + (z,), jnp.int32)
            for (j, s) in entries[i]:
                acc = acc ^ jnp.roll(blocks[j], -s, axis=-1)
            blocks.append(acc)
        return jnp.stack(blocks, axis=-2).reshape(*u.shape[:-1], code.n)

    return encode


# ---------------------------------------------------------------------------
# Rate matching (TS 38.212 §5.4.2 style, rv0)
# ---------------------------------------------------------------------------

def rate_match_bits(code: QCCode, cw: jax.Array, e: int) -> jax.Array:
    """[..., n] codeword -> [..., e] transmitted bits: skip the first 2Z
    punctured systematic bits, then read the circular buffer."""
    p = code.punctured_front
    buf = cw[..., p:]
    n_buf = buf.shape[-1]
    idx = np.arange(e) % n_buf
    return buf[..., idx]


def rate_match_llr(code: QCCode, llr_e: jax.Array, e: int) -> jax.Array:
    """[..., e] received LLRs -> [..., n] decoder input.

    Untransmitted buffer positions get LLR 0 (unknown); repeated positions
    accumulate (soft combining); the 2Z never-transmitted punctured bits get
    LLR 0 as well.
    """
    p = code.punctured_front
    n_buf = code.n - p
    idx = np.arange(e) % n_buf
    buf = jnp.zeros(llr_e.shape[:-1] + (n_buf,), llr_e.dtype)
    buf = buf.at[..., idx].add(llr_e)
    front = jnp.zeros(llr_e.shape[:-1] + (p,), llr_e.dtype)
    return jnp.concatenate([front, buf], axis=-1)
