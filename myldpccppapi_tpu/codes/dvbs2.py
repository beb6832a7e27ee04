"""DVB-S2-style IRA LDPC codes (n = 64800 / 16200, accumulator parity).

BASELINE config-3 capability: the EN 302 307 code structure — information
bits addressed in groups of 360 with q-periodic row spreading, plus a
bidiagonal parity accumulator — with O(n) encoding (one prefix-XOR pass, no
matrices) and the generic edge-list decoder for BP (the H is not
block-circulant under one permutation, so the QC roll path does not apply).

The per-rate *address tables are synthetic*: deterministic draws with the
standard's group structure and a standard-like degree profile (a fraction of
degree-8 groups, the rest degree-3), NOT the EN 302 307 Annex B/C tables —
so not bit-interoperable with DVB hardware.  The table is plain data
(``addresses``): substituting the standard's values upgrades to full
interoperability with no code change.

Layered decoding groups rows by residue class mod q (360 rows/layer): the
q-periodic spreading makes intra-layer column conflicts rare, the classic
DVB-S2 layered schedule.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DVBS2Code", "dvbs2"]

_GROUP = 360


@dataclasses.dataclass(frozen=True, eq=False)
class DVBS2Code:
    """IRA code: H = [H_info | H_acc], accumulator bidiagonal parity."""

    name: str
    n: int
    k: int
    #: per info-group address lists: addresses[g] = row indices of bit g*360
    addresses: Tuple[Tuple[int, ...], ...]

    @property
    def m(self) -> int:
        return self.n - self.k

    @property
    def q(self) -> int:
        return self.m // _GROUP

    @property
    def rate(self) -> float:
        return self.k / self.n

    @property
    def k_info(self) -> int:
        return self.k

    @property
    def info_positions(self) -> np.ndarray:
        return np.arange(self.k, dtype=np.int64)

    @cached_property
    def info_edges(self) -> Tuple[np.ndarray, np.ndarray]:
        """(rows, cols) of the information part of H."""
        m, q = self.m, self.q
        rows, cols = [], []
        for g, addrs in enumerate(self.addresses):
            j = np.arange(_GROUP, dtype=np.int64)
            for a in addrs:
                rows.append((a + j * q) % m)
                cols.append(g * _GROUP + j)
        return np.concatenate(rows), np.concatenate(cols)

    def h_coo(self) -> Tuple[np.ndarray, np.ndarray]:
        """Full H edge list (info part + accumulator), row-major sorted."""
        ir, ic = self.info_edges
        m = self.m
        acc_rows = np.concatenate([np.arange(m), np.arange(1, m)])
        acc_cols = np.concatenate(
            [self.k + np.arange(m), self.k + np.arange(m - 1)]
        )
        rows = np.concatenate([ir, acc_rows])
        cols = np.concatenate([ic, acc_cols])
        order = np.lexsort((cols, rows))
        return rows[order], cols[order]

    @cached_property
    def edge_index(self):
        """Padded edge tables with mod-q layered grouping (360 rows/layer)."""
        from ..ops.bp_edgelist import build_edge_index

        rows, cols = self.h_coo()
        layer = (np.arange(self.m) % self.q).astype(np.int32)
        return build_edge_index(rows, cols, self.n, self.m, layer)

    # -- encoding ----------------------------------------------------------
    def encode_numpy(self, u: np.ndarray) -> np.ndarray:
        """[..., k] info bits -> [..., n]: scatter + prefix-XOR accumulator."""
        u = np.asarray(u)
        rows, cols = self.info_edges
        flat_u = u.reshape(-1, self.k).astype(np.int64)
        flat_lam = np.zeros((flat_u.shape[0], self.m), dtype=np.int64)
        np.add.at(flat_lam.T, rows, flat_u.T[cols])
        p = np.cumsum(flat_lam, axis=-1) & 1
        out = np.concatenate([flat_u & 1, p], axis=-1).astype(u.dtype)
        return out.reshape(*u.shape[:-1], self.n)

    def encode_fn(self):
        """jnp encoder: [B, k] -> [B, n] (jit/shard-safe)."""
        rows, cols = self.info_edges
        rows_j = jnp.asarray(rows, jnp.int32)
        cols_j = jnp.asarray(cols, jnp.int32)
        m, k = self.m, self.k

        def encode(u: jax.Array) -> jax.Array:
            ue = u.astype(jnp.int32)[:, cols_j]  # [B, E_info]
            lam = jnp.zeros((u.shape[0], m), jnp.int32).at[:, rows_j].add(ue)
            p = jnp.cumsum(lam, axis=-1) & 1
            return jnp.concatenate([u.astype(jnp.int32) & 1, p], axis=-1)

        return encode

    def syndrome(self, cw: np.ndarray) -> np.ndarray:
        """H @ c mod 2 via the edge list (numpy, for tests)."""
        rows, cols = self.h_coo()
        cw = np.asarray(cw)
        flat = cw.reshape(-1, self.n).astype(np.int64)
        syn = np.zeros((flat.shape[0], self.m), dtype=np.int64)
        np.add.at(syn.T, rows, flat.T[cols])
        return (syn & 1).reshape(*cw.shape[:-1], self.m)

    def describe(self) -> str:
        e = len(self.info_edges[0]) + 2 * self.m - 1
        return (
            f"DVBS2Code({self.name}: n={self.n}, k={self.k}, q={self.q}, "
            f"rate={self.rate:.3f}, edges~{e})"
        )


# EN 302 307 Table 5b: short-frame (n=16200) k_ldpc per nominal rate — the
# effective rate differs from the label (e.g. "1/2" short is k=7200).
_SHORT_K_LDPC = {
    "1/4": 3240, "1/3": 5400, "2/5": 6480, "1/2": 7200, "3/5": 9720,
    "2/3": 10800, "3/4": 11880, "4/5": 12600, "5/6": 13320, "8/9": 14400,
}


_QC_P0_SHIFT = 1  # shift of the p0 column's paired entries (any value works:
                  # x^s + 1 + x^s = 1 over GF(2), so p0 = sum of all row sums)


def dvbs2_qc(n: int = 64800, rate: str = "1/2"):
    """DVB-S2-style code as a z=360 quasi-cyclic ``QCCode`` (the fast path).

    The standard's q-periodic address spreading IS block-circulant: row
    ``a + j*q`` of info group g, for j = 0..359, is layer ``a mod q`` at
    layer-position ``(j + a//q) mod 360`` — i.e. block (a % q, g) is a
    shifted identity with shift ``-(a//q) mod 360`` (the classic DVB-S2
    hardware-decoder transformation).  The bit-level parity accumulator is
    replaced by the 802.16e-style QC parity (``MyLdpc.h:40-102`` column
    h_b0): one column with entries at rows {0, mid, last} whose shifted
    pair cancels over GF(2), then a shift-0 dual-diagonal staircase.  Every
    parity column has degree >= 2 (the pure block staircase would leave 360
    degree-1 bits and an error floor) and encoding is one O(edges) pass
    (:func:`qc_ira_encode_numpy`).  Synthetic address tables as in
    :func:`dvbs2` (one address per (group, residue) pair so every base
    block is a single circulant).
    """
    from .qc import QCCode

    num, den = map(int, rate.split("/"))
    k = _SHORT_K_LDPC[rate] if n == 16200 else n * num // den
    m = n - k
    if k % _GROUP or m % _GROUP:
        raise ValueError(f"n={n} rate={rate}: k and m must be multiples of 360")
    q = m // _GROUP
    kb = k // _GROUP
    n_heavy = kb // 3
    rng = np.random.default_rng(302307 + n + 100 * num + den)
    base = np.full((q, kb + q), -1, dtype=np.int32)
    for g in range(kb):
        deg = 8 if g < n_heavy else 3
        residues = rng.choice(q, size=deg, replace=False)
        for l in residues:
            a = int(l) + q * int(rng.integers(0, _GROUP))
            base[l, g] = (-(a // q)) % _GROUP
    # 802.16e-style parity: p0 column + staircase
    base[0, kb] = _QC_P0_SHIFT
    base[q // 2, kb] = 0
    base[q - 1, kb] = _QC_P0_SHIFT
    for j in range(q - 1):  # staircase col kb+1+j in rows j, j+1
        base[j, kb + 1 + j] = 0
        base[j + 1, kb + 1 + j] = 0
    return QCCode(name=f"dvbs2qc_n{n}_r{num}{den}", base=base, z=_GROUP)


def _qc_row_sums(code, u, xp):
    """lam_l [B, z] for each base row l from the info part only."""
    z = code.z
    kb = code.k // z
    ub = u.reshape(*u.shape[:-1], kb, z)
    lams = []
    for l in range(code.m_b):
        acc = xp.zeros(u.shape[:-1] + (z,), dtype=xp.int32)
        for g in range(kb):
            s = int(code.base[l, g])
            if s >= 0:
                acc = acc ^ xp.roll(ub[..., g, :], -s, axis=-1)
        lams.append(acc)
    return lams


def qc_ira_encode_numpy(code, u: np.ndarray) -> np.ndarray:
    """O(edges) encode for the dvbs2_qc parity structure.

    p0 = XOR of all block-row info sums (the paired shifted entries of the
    p0 column cancel, the middle one survives); the staircase columns then
    follow by forward substitution.  The last block row closes
    automatically (verified by construction: the telescoped sum equals
    p0 + p0 = 0).
    """
    u = np.asarray(u)
    z = code.z
    q = code.m_b
    kb = code.k // z
    lams = _qc_row_sums(code, u, np)
    p0 = lams[0].copy()
    for l in range(1, q):
        p0 = p0 ^ lams[l]
    blocks = [u.reshape(*u.shape[:-1], kb, z)[..., g, :] for g in range(kb)]
    blocks.append(p0 & 1)
    s_prev = np.zeros_like(p0)
    for i in range(q - 1):
        t = lams[i].copy()
        sp0 = int(code.base[i, kb])
        if sp0 >= 0:
            t = t ^ np.roll(p0, -sp0, axis=-1)
        s_prev = s_prev ^ t
        blocks.append(s_prev & 1)
    return np.concatenate(blocks, axis=-1).astype(u.dtype)


def qc_ira_encode_fn(code):
    """jnp version of :func:`qc_ira_encode_numpy` (jit/shard-safe)."""
    import jax.numpy as jnp

    z = code.z
    q = code.m_b
    kb = code.k // z
    entries = [
        [(g, int(code.base[l, g])) for g in range(kb) if code.base[l, g] >= 0]
        for l in range(q)
    ]
    p0_shifts = [int(code.base[l, kb]) for l in range(q)]

    def encode(u):
        ub = u.reshape(*u.shape[:-1], kb, z).astype(jnp.int32)
        lams = []
        for l in range(q):
            acc = jnp.zeros(u.shape[:-1] + (z,), jnp.int32)
            for (g, s) in entries[l]:
                acc = acc ^ jnp.roll(ub[..., g, :], -s, axis=-1)
            lams.append(acc)
        p0 = lams[0]
        for l in range(1, q):
            p0 = p0 ^ lams[l]
        blocks = [ub[..., g, :] for g in range(kb)] + [p0 & 1]
        s_prev = jnp.zeros_like(p0)
        for i in range(q - 1):
            t = lams[i]
            if p0_shifts[i] >= 0:
                t = t ^ jnp.roll(p0, -p0_shifts[i], axis=-1)
            s_prev = s_prev ^ t
            blocks.append(s_prev & 1)
        return jnp.stack(blocks, axis=-2).reshape(*u.shape[:-1], code.n)

    return encode


def dvbs2(n: int = 64800, rate: str = "1/2") -> DVBS2Code:
    """Construct a DVB-S2-style code (synthetic address tables, see module
    docstring).  Supported n: 64800 (normal), 16200 (short)."""
    num, den = map(int, rate.split("/"))
    if n == 16200:
        if rate not in _SHORT_K_LDPC:
            raise ValueError(f"unknown short-frame rate {rate!r}")
        k = _SHORT_K_LDPC[rate]
    else:
        k = n * num // den
    if (n - k) % _GROUP or k % _GROUP:
        raise ValueError(f"n={n} rate={rate}: k and m must be multiples of 360")
    m = n - k
    groups = k // _GROUP
    # standard-like degree profile: 1/3 of groups degree 8, the rest degree 3
    n_heavy = groups // 3
    rng = np.random.default_rng(302307 + n + 100 * num + den)
    addrs = []
    for g in range(groups):
        deg = 8 if g < n_heavy else 3
        addrs.append(tuple(int(a) for a in rng.integers(0, m, size=deg)))
    return DVBS2Code(
        name=f"dvbs2_n{n}_r{num}{den}",
        n=n,
        k=k,
        addresses=tuple(addrs),
    )
