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
    "harq_combine",
    "rv_start",
    "lifting_set_index",
    "parse_bg_table",
    "NR_ZMAX",
    "NR_LIFTING_SETS",
]

NR_ZMAX = 384

_BG_SHAPES = {1: (46, 68, 22), 2: (42, 52, 10)}

#: TS 38.212 Table 5.3.2-1: supported lifting sizes Z = a * 2^j, grouped
#: into 8 sets by a in {2, 3, 5, 7, 9, 11, 13, 15}; the published shift
#: tables give one value column V per set, and the applied shift is
#: ``V mod Z``.
NR_LIFTING_SETS = (
    (2, 4, 8, 16, 32, 64, 128, 256),
    (3, 6, 12, 24, 48, 96, 192, 384),
    (5, 10, 20, 40, 80, 160, 320),
    (7, 14, 28, 56, 112, 224),
    (9, 18, 36, 72, 144, 288),
    (11, 22, 44, 88, 176, 352),
    (13, 26, 52, 104, 208),
    (15, 30, 60, 120, 240),
)


def lifting_set_index(z: int) -> int:
    """iLS of a supported lifting size (TS 38.212 Table 5.3.2-1)."""
    for i, zs in enumerate(NR_LIFTING_SETS):
        if z in zs:
            return i
    raise ValueError(f"Z={z} is not a 38.212 lifting size")


def parse_bg_table(text: str) -> np.ndarray:
    """Parse a TS 38.212-style base-graph shift table.

    Real-world distributions of the published tables come in several
    formats; all are accepted (VERDICT r4 item 8) and all fingerprint
    identically via :func:`.tables.table_fingerprint` once parsed:

    * **canonical sparse**: ``row col v0 v1 ... v7`` — one line per
      non-null entry, one V column per lifting set -> ``[m_b, n_b, 8]``;
    * **per-set sparse**: ``row col V`` — one lifting set per file ->
      ``[m_b, n_b]`` (feed to :func:`nr_code` directly; the applied shift
      is ``V mod z``);
    * **dense matrix**: ``m_b`` lines of ``n_b`` shifts with ``-1`` nulls
      (the common MATLAB/numpy export) -> ``[m_b, n_b]``.

    Tokens may be separated by whitespace, commas, or semicolons; ``#``
    and ``%`` start comments (inline too); lines whose first token is not
    an integer (column headers) are skipped; duplicate ``(row, col)``
    entries raise — a silent overwrite is exactly the transcription
    corruption this loader exists to prevent.  The published tables are
    data for this loader (they are not embedded here: this environment has
    no access to the 3GPP publication, and a from-memory transcription of
    2528 constants would risk silent corruption).
    """
    rows = []
    for line in text.strip().splitlines():
        for c in "#%":
            line = line.split(c, 1)[0]
        line = line.replace(",", " ").replace(";", " ").strip()
        if not line:
            continue
        toks = line.split()
        try:
            int(toks[0])
        except ValueError:
            continue  # column-header line ("Row Col V0 ...")
        try:
            rows.append([int(t) for t in toks])
        except ValueError as e:
            raise ValueError(f"non-integer token in table line {line!r}: {e}")
    if not rows:
        raise ValueError("no table entries found")
    widths = {len(r) for r in rows}
    if len(widths) != 1:
        raise ValueError(
            f"inconsistent column counts {sorted(widths)}: expected one of "
            "the documented formats (row col v0..v7 / row col V / dense)"
        )
    w = widths.pop()
    if w in (3, 10):  # sparse: row col V... (V per lifting set or single)
        nv = w - 2
        for r in rows:
            if r[0] < 0 or r[1] < 0:
                # Python negative indexing would silently write the LAST
                # row/col — the exact silent corruption this loader exists
                # to prevent
                raise ValueError(
                    f"negative (row, col)=({r[0]}, {r[1]}) in table entry"
                )
            if any(v < -1 for v in r[2:]):
                raise ValueError(
                    f"shift value < -1 in entry (row, col)=({r[0]}, {r[1]})"
                )
        m_b = max(r[0] for r in rows) + 1
        n_b = max(r[1] for r in rows) + 1
        shape = (m_b, n_b, 8) if nv == 8 else (m_b, n_b)
        table = np.full(shape, -1, dtype=np.int32)
        seen = set()
        for r in rows:
            key = (r[0], r[1])
            if key in seen:
                raise ValueError(f"duplicate entry for (row, col)={key}")
            seen.add(key)
            table[key] = r[2:] if nv == 8 else r[2]
        return table
    if w in (9, 11):
        # one token away from the sparse widths: almost certainly a
        # uniformly truncated/extended sparse file, not a 9/11-column
        # dense base graph (no published base graph is that narrow) —
        # refuse rather than misparse row/col indices as shift values
        raise ValueError(
            f"every line has {w} tokens — one off from the sparse formats "
            "(3 or 10); refusing to guess (a uniformly truncated sparse "
            "table would otherwise silently parse as a dense matrix)"
        )
    # dense matrix: every line is one base-graph row of n_b shifts
    dense = np.asarray(rows, dtype=np.int32)
    if (dense < -1).any():
        raise ValueError("dense table contains values < -1")
    return dense


def _fill_girth6_shifts(base, rng, zmax) -> None:
    """Assign shifts to the ``-2``-marked cells of ``base`` (in place) so
    the lifted graph at lifting size ``zmax`` has no 4-cycles (girth >= 6).

    QC 4-cycle condition: block rows i1, i2 sharing columns j1, j2 form z
    4-cycles iff ``s[i1,j1] - s[i1,j2] + s[i2,j2] - s[i2,j1] == 0 (mod z)``.
    Filling cell (i, j) therefore forbids, for every other row i2 with an
    assigned entry in column j and every shared assigned column j2, the
    single value ``s[i,j2] - s[i2,j2] + s[i2,j] (mod zmax)``.  Row degrees
    here are tiny relative to zmax, so the forbidden set never exhausts
    [0, zmax); an assert guards the invariant rather than falling back
    silently.  The guarantee is exact at z == zmax (the design lifting);
    smaller z reduce shifts mod z and may reintroduce short cycles (as any
    fixed table must).
    """
    m_b, n_b = base.shape
    for i in range(m_b):
        for j in range(n_b):
            if base[i, j] != -2:
                continue
            forbidden = set()
            for i2 in range(m_b):
                if i2 == i or base[i2, j] < 0:
                    continue
                for j2 in range(n_b):
                    if j2 != j and base[i, j2] >= 0 and base[i2, j2] >= 0:
                        forbidden.add(
                            (base[i, j2] - base[i2, j2] + base[i2, j]) % zmax
                        )
            allowed = [s for s in range(zmax) if s not in forbidden]
            assert allowed, "girth-6 fill exhausted the shift range"
            base[i, j] = int(rng.choice(allowed))


#: Default synthetic-table seed per base graph, selected from four girth-6
#: candidates by measured knee/tail FER on chip (results.jsonl
#: "nr_table_select": BG1 seed 3 = 5.6e-3 @-1.25 dB / 4.6e-5 @-0.75;
#: BG2 seed 0 = 1.1e-3 / 1.1e-4 — candidates spread up to 3 orders of
#: magnitude in floor FER even at equal girth, exactly why published
#: tables are finalized by simulation).
_DEFAULT_TABLE_SEED = {1: 3, 2: 0}

#: Shift seed for the PEXIT-designed supports (codes/nr_designed.py),
#: selected from four girth-6 candidates by measured tail FER on chip
#: (results.jsonl "nr_design_seed_select").
_DESIGNED_SHIFT_SEED = {2: 0}


def nr_base_graph(bg: int = 1, zmax: int = NR_ZMAX,
                  seed: "int | None" = None,
                  support: "np.ndarray | None" = None) -> np.ndarray:
    """Synthetic BG1/BG2-structured base matrix with shifts in [0, zmax).

    Structure (matching TS 38.212's shape, not its values):
    * columns 0..k_b-1: systematic; cols 0 and 1 are high-degree (they are
      the punctured columns and need the protection),
    * cols k_b..k_b+3: core parity, lower-bidiagonal staircase (shift 0),
    * cols k_b+4..: one identity column per extension row,
    * core rows are dense over the systematic columns; extension rows have
      degree ~4 plus their identity bit.

    ``support``: the edge support to lift.
    * ``None`` (default): the PEXIT-designed support where one exists
      (:mod:`.nr_designed` — BG2, threshold -0.715 dB vs the legacy
      profile-recall synthetic's +1.58; measured on chip as a ~1.75 dB
      waterfall shift, results.jsonl "nr_design_eval"/"nr_design_scan"),
      else the legacy random-profile synthetic.
    * ``"legacy"``: the pre-design random-profile synthetic (what rounds
      1-3 measured; kept for comparability).
    * an explicit boolean [m_b, n_b] array — e.g. fresh output of
      :func:`.design.optimize_nr_support`.
    The staircase / identity diagonal cells keep shift 0 (the triangular
    encoder); all other support cells get girth-aware shifts.

    Shifts are chosen 4-cycle-free at the design lifting ``zmax``
    (:func:`_fill_girth6_shifts`) — the published tables are also
    girth-optimized, and an unconstrained random table costs a measurable
    error-floor penalty (BENCH_NOTES round-2 NR waterfall).
    """
    m_b, n_b, k_b = _BG_SHAPES[bg]
    if support is None:
        from .nr_designed import DESIGNED_SUPPORT, designed_support

        support = designed_support(bg) if bg in DESIGNED_SUPPORT else "legacy"
    if isinstance(support, str):
        if support != "legacy":
            raise ValueError(f"unknown support {support!r}")
        support = None
    if seed is None:
        # explicit/designed supports use the measured designed shift seed
        # where one exists, else the legacy default (e.g. a fresh BG1
        # design from optimize_nr_support has no designed seed yet)
        seed = (_DESIGNED_SHIFT_SEED.get(bg, _DEFAULT_TABLE_SEED[bg])
                if support is not None else _DEFAULT_TABLE_SEED[bg])
    rng = np.random.default_rng(38212 + bg + 7919 * seed)
    # -1 = zero block, -2 = present (shift chosen girth-aware below)
    base = np.full((m_b, n_b), -1, dtype=np.int32)

    if support is not None:
        support = np.asarray(support, dtype=bool)
        if support.shape != (m_b, n_b):
            raise ValueError(f"BG{bg} support must be [{m_b}, {n_b}]")
        base[support] = -2
    else:
        # core rows: dense over systematic columns
        for i in range(4):
            cols = set(range(0, 2)) | set(
                rng.choice(np.arange(2, k_b), size=max(k_b - 5, 2),
                           replace=False)
            )
            for j in cols:
                base[i, j] = -2
        # extension rows
        for r in range(4, m_b):
            cols = {r % 2}  # protect the punctured columns 0/1
            cols |= set(rng.choice(np.arange(2, k_b), size=3, replace=False))
            if rng.random() < 0.4:
                cols.add(int(k_b + rng.integers(0, 4)))
            for j in cols:
                base[r, j] = -2
    # core parity staircase (shift 0 diagonals -> trivially invertible)
    for i in range(4):
        base[i, k_b + i] = 0
        if i + 1 < 4:
            base[i + 1, k_b + i] = 0
    # identity extension columns
    for r in range(4, m_b):
        base[r, k_b + 4 + (r - 4)] = 0
    _fill_girth6_shifts(base, rng, zmax)
    return base


def nr_code(z: int = 384, bg: int = 1,
            table: "np.ndarray | None" = None) -> QCCode:
    """Lift a base graph to size ``z`` per the 38.212 rule: the applied
    shift of a non-null entry is ``V mod z`` with V taken from the lifting
    set of ``z`` (``lifting_set_index``).

    ``table`` may be a [m_b, n_b, 8] per-set V array (the output of
    :func:`parse_bg_table` on the published tables — bit-true standard
    code) or a [m_b, n_b] single-V array; default is the synthetic
    :func:`nr_base_graph` (standard structure, synthetic values).
    """
    m_b, n_b, k_b = _BG_SHAPES[bg]
    if table is None:
        raw = nr_base_graph(bg)
    elif np.asarray(table).ndim == 3:
        tab = np.asarray(table)
        if tab.shape[:2] != (m_b, n_b):
            raise ValueError(f"BG{bg} table must be [{m_b}, {n_b}, 8]")
        raw = tab[:, :, lifting_set_index(z)]
    else:
        raw = np.asarray(table)
        if raw.shape != (m_b, n_b):
            # a transcription that dropped a row/column must fail here,
            # not as a mysteriously shifted BER curve
            raise ValueError(
                f"BG{bg} single-set table must be [{m_b}, {n_b}], "
                f"got {list(raw.shape)}"
            )
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
# Rate matching (TS 38.212 §5.4.2: circular buffer, redundancy versions)
# ---------------------------------------------------------------------------

#: TS 38.212 Table 5.4.2.1-2 numerators of the rv starting position
#: k0 = floor(num * Ncb / (den * Zc)) * Zc, indexed [bg][rv].
_RV_K0_NUM = {1: (0, 17, 33, 56), 2: (0, 13, 25, 43)}
_RV_K0_DEN = {1: 66, 2: 50}


def rv_start(code: QCCode, rv: int = 0, n_cb: "int | None" = None) -> int:
    """Circular-buffer starting position k0 of redundancy version ``rv``
    (TS 38.212 Table 5.4.2.1-2)."""
    if rv not in (0, 1, 2, 3):
        raise ValueError(f"rv must be 0..3, got {rv}")
    bg = 1 if code.n_b == 68 else 2
    z = code.z
    if n_cb is None:
        n_cb = code.n - code.punctured_front
    return (_RV_K0_NUM[bg][rv] * n_cb) // (_RV_K0_DEN[bg] * z) * z


def rate_match_bits(code: QCCode, cw: jax.Array, e: int, rv: int = 0,
                    n_cb: "int | None" = None) -> jax.Array:
    """[..., n] codeword -> [..., e] transmitted bits: skip the first 2Z
    punctured systematic bits, then read the circular buffer of length
    ``n_cb`` starting at rv's k0, wrapping as needed."""
    p = code.punctured_front
    buf = cw[..., p:]
    if n_cb is None:
        n_cb = buf.shape[-1]
    idx = (rv_start(code, rv, n_cb) + np.arange(e)) % n_cb
    return buf[..., idx]


def harq_combine(code: QCCode, transmissions, n_cb: "int | None" = None) -> jax.Array:
    """Soft-combine HARQ (re)transmissions into one decoder input.

    ``transmissions``: sequence of ``(llr_e, rv)`` pairs — the received
    [..., e_i] LLRs and redundancy version of each transmission of the SAME
    code block (TS 38.212 §5.4.2.1 circular buffer).  Because AWGN LLRs of
    independent observations add, chase combining (same rv) and incremental
    redundancy (different rvs) are both exactly this sum: positions sent in
    several transmissions accumulate energy, positions never sent stay 0
    (erased).  Returns the [..., n] combined decoder input.

    The reference has no HARQ analogue; this is the receive half of the NR
    retransmission protocol on top of :func:`rate_match_llr`.
    """
    out = None
    for llr_e, rv in transmissions:
        full = rate_match_llr(code, llr_e, llr_e.shape[-1], rv, n_cb)
        out = full if out is None else out + full
    if out is None:
        raise ValueError("at least one transmission required")
    return out


def rate_match_llr(code: QCCode, llr_e: jax.Array, e: "int | None" = None,
                   rv: int = 0, n_cb: "int | None" = None) -> jax.Array:
    """[..., e] received LLRs -> [..., n] decoder input.

    ``e`` (the transmitted length) is implied by ``llr_e`` and may be
    omitted; passing a mismatched value is rejected.

    Untransmitted buffer positions get LLR 0 (unknown); repeated positions
    accumulate (soft combining — also correct for HARQ retransmissions
    decoded jointly); the 2Z never-transmitted punctured bits get LLR 0 as
    well.
    """
    if e is None:
        e = llr_e.shape[-1]
    elif e != llr_e.shape[-1]:
        raise ValueError(
            f"e={e} disagrees with llr_e.shape[-1]={llr_e.shape[-1]}"
        )
    p = code.punctured_front
    n_buf = code.n - p
    if n_cb is None:
        n_cb = n_buf
    k0 = rv_start(code, rv, n_cb)
    buf = jnp.zeros(llr_e.shape[:-1] + (n_buf,), llr_e.dtype)
    if e <= n_cb:
        # no repeated positions: pure placement via static slices (the
        # general scatter-add below costs a real gather/scatter on TPU)
        if k0 + e <= n_cb:
            buf = buf.at[..., k0:k0 + e].set(llr_e)
        else:
            head = n_cb - k0
            buf = buf.at[..., k0:n_cb].set(llr_e[..., :head])
            buf = buf.at[..., : e - head].set(llr_e[..., head:])
    else:
        # wraps past a full buffer: repeated positions accumulate
        idx = (k0 + np.arange(e)) % n_cb
        buf = buf.at[..., idx].add(llr_e)
    front = jnp.zeros(llr_e.shape[:-1] + (p,), llr_e.dtype)
    return jnp.concatenate([front, buf], axis=-1)
