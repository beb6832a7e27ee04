"""Streaming fused decoder for long codes (HBM-resident state, layer DMA).

The VMEM-resident kernels (ops/pallas_bp.py, ops/pallas_zlane.py) need the
whole working set — posterior + messages — on chip, which caps them (the
z-lane kernel at a ~39 MB state estimate under its 64 MB scoped-VMEM
ceiling).  This kernel keeps the posterior and check messages in HBM
workspaces and DMAs one LAYER's working set into VMEM at a time: the
streaming evolution of the reference's fused decoders for codes that
outgrow local memory, and the TPU analogue of what DVB-S2 hardware decoders
do with DDR + row banks.

Performance structure (this file's second hardware iteration):

* **Double buffering**: two layer-tile sets alternate; while layer ``i``
  computes, layer ``i+1``'s check-message slice (always disjoint across
  layers) and its *conflict-free* posterior blocks (a static per-layer-pair
  ``safe`` table: columns not written back by layer ``i``) are already in
  flight.  Conflicting blocks load after layer ``i``'s writeback completes
  — the RAW dependency through HBM that layered scheduling creates.
* **Lazy syndrome** (``cfg.syndrome_mode == "lazy"``): the per-sweep
  convergence check folds into the sweep itself (sign of the row-aligned
  posterior each edge already loads), and the exact syndrome pass — a full
  extra posterior DMA sweep — runs only on iterations where some live
  lane's on-the-fly check passes.  Done is latched ONLY by the exact pass,
  so converged => valid codeword exactly as in "exact" mode (same contract
  as ops/pallas_zlane.py).
* The exact syndrome pass streams only posterior blocks (messages are not
  needed to re-check parity).

Layered min-sum only (the configuration long codes use).  Early-exit
semantics are implemented by FREEZING converged lanes (their posterior and
messages stop updating), which is exactly equivalent to the other paths'
output latching because codeword lanes are independent.

Status: bit-exact vs the jnp path ON HARDWARE (v5e) including iteration
counts and under the triage wrapper; plain single-circulant QC codes only
(``stream_supported`` refuses multi-edge/masked structures — the z-lane
kernel owns those).  Opt in with
``DecoderConfig(implementation="pallas_stream")`` or let auto dispatch
route codes beyond the z-lane ceiling here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.qc import QCCode
from ..utils.config import DecoderConfig

__all__ = ["decode_qc_stream", "stream_supported"]

_LANES = 128


# the negative-dynamic-shift workaround lives in pallas_bp (one copy)
from .pallas_bp import _neg_roll  # noqa: E402


def stream_supported(code: QCCode, cfg: DecoderConfig) -> bool:
    """Plain single-circulant QC codes only: the streaming kernel has no
    mask channel (a row-masked partial circulant would be decoded as a
    full one — a DIFFERENT H), and a multi-edge base cell would give two
    slots of one layer the same posterior column whose writeback DMAs
    race.  The z-lane kernel (pallas_zlane) handles both; this fallback
    refuses rather than silently decoding the wrong matrix."""
    if getattr(code, "group", "cyclic") != "cyclic":
        # XOR-group (RS-LDPC) blocks: this kernel's lane rotations are
        # CYCLIC — running it would silently decode a different H
        return False
    if getattr(code, "extra_blocks", None) is not None or getattr(code, "masked_rows", None):
        return False
    if not isinstance(cfg.normalization, (int, float)) or not isinstance(
        cfg.offset, (int, float)
    ):
        # per-layer/per-iteration weight schedules: the streaming kernel
        # sweeps layers in a fori_loop (no static unroll to bake them into)
        return False
    return (
        cfg.schedule == "layered"
        and cfg.algorithm == "min-sum"
        and cfg.msg_dtype == "float32"
    )


def _tables(code: QCCode):
    dmax = code.max_row_degree
    n_b = code.n_b
    col_tab = np.full((code.m_b, dmax), n_b, dtype=np.int32)  # pad = n_b
    shift_tab = np.zeros((code.m_b, dmax), dtype=np.int32)
    br, bc, sh = code.blocks
    ptr = code.layer_ptr
    for i in range(code.m_b):
        for d, e in enumerate(range(int(ptr[i]), int(ptr[i + 1]))):
            col_tab[i, d] = int(bc[e])
            shift_tab[i, d] = int(sh[e])
    return col_tab, shift_tab, dmax


def _safe_table(col_tab: np.ndarray, n_b: int) -> np.ndarray:
    """safe[i, d] = 1 iff prefetching layer i+1's slot d during layer i
    cannot race layer i's posterior writeback: the slot is a pad (reads the
    don't-care dummy block) or its column is not written by layer i.  The
    last layer never prefetches (no cross-sweep pipelining: the exact
    syndrome pass and the while-loop exit sit between sweeps)."""
    m_b, dmax = col_tab.shape
    safe = np.zeros((m_b, dmax), dtype=np.int32)
    for i in range(m_b - 1):
        cols_i = {int(c) for c in col_tab[i] if c < n_b}
        for d in range(dmax):
            j = int(col_tab[i + 1, d])
            safe[i, d] = 1 if (j >= n_b or j not in cols_i) else 0
    return safe


def _build_stream_kernel(code: QCCode, cfg: DecoderConfig, bt: int,
                         dmax: int, nbuf: int):
    z = code.z
    m_b, n_b = code.m_b, code.n_b
    db = nbuf == 2
    lazy = cfg.syndrome_mode == "lazy"

    def kernel(col_tab, shift_tab, safe_tab, chan_hbm, bits_hbm, conv_ref,
               iters_ref, texec_ref, p_hbm, r_hbm, p_tiles, r_tiles,
               done_scr, bits_vmem, pin_sem, pout_sem, rin_sem, rout_sem,
               misc_sem):
        # refs: chan/bits/p/r in HBM (pl.ANY); p_tiles/r_tiles
        # [nbuf, dmax, z, bt] VMEM, done_scr [1, bt], bits_vmem [1, z, bt]
        # int8 staging; sems: pin/pout [nbuf, dmax], rin/rout [nbuf].
        off = pl.program_id(0) * bt
        lane = pl.ds(off, bt)

        def dma_p_in(b, d, j):
            return pltpu.make_async_copy(
                p_hbm.at[j, :, lane], p_tiles.at[b, d], pin_sem.at[b, d]
            )

        def dma_p_out(b, d, j):
            return pltpu.make_async_copy(
                p_tiles.at[b, d], p_hbm.at[j, :, lane], pout_sem.at[b, d]
            )

        def dma_r_in(b, i):
            return pltpu.make_async_copy(
                r_hbm.at[i, :, :, lane], r_tiles.at[b], rin_sem.at[b]
            )

        def dma_r_out(b, i):
            return pltpu.make_async_copy(
                r_tiles.at[b], r_hbm.at[i, :, :, lane], rout_sem.at[b]
            )

        # ---- init: posterior = channel, messages = 0 ------------------
        def init_block(j, _):
            cp = pltpu.make_async_copy(
                chan_hbm.at[j, :, lane], p_tiles.at[0, 0], misc_sem
            )
            cp.start()
            cp.wait()
            wr = pltpu.make_async_copy(
                p_tiles.at[0, 0], p_hbm.at[j, :, lane], misc_sem
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, n_b, init_block, 0)
        # zero the dummy pad block too
        p_tiles[0, 0] = jnp.zeros_like(p_tiles[0, 0])
        zb = pltpu.make_async_copy(
            p_tiles.at[0, 0], p_hbm.at[n_b, :, lane], misc_sem
        )
        zb.start()
        zb.wait()
        r_tiles[0] = jnp.zeros_like(r_tiles[0])

        def init_r(i, _):
            wr = pltpu.make_async_copy(
                r_tiles.at[0], r_hbm.at[i, :, :, lane], misc_sem
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, m_b, init_r, 0)
        done_scr[:] = jnp.zeros_like(done_scr)
        iters_ref[:] = jnp.zeros_like(iters_ref)

        def make_step(buf):
            """One layer's update with STATIC buffer assignment ``buf``
            (the fori body dispatches on layer parity via lax.cond so all
            VMEM/semaphore indices stay static)."""
            nxtb = (buf + 1) % nbuf
            pb = nxtb if db else buf  # parity buffer of layer i-1

            def step(i, pre_bad):
                # (A) wait layer i-1's posterior writeback: late loads and
                # this layer's compute may touch the columns it wrote
                @pl.when(i > 0)
                def _():
                    for d in range(dmax):
                        dma_p_out(pb, d, col_tab[i - 1, d]).wait()

                # (B) posterior loads for THIS layer: slots prefetched at
                # layer i-1 (safe) are already in flight; the rest start now
                # (the i-1 index is clamped so the SMEM read stays in
                # bounds when i == 0 — the i == 0 term then wins)
                iprev = jnp.maximum(i - 1, 0)
                for d in range(dmax):
                    if db:
                        @pl.when((i == 0) | (safe_tab[iprev, d] == 0))
                        def _(d=d):
                            dma_p_in(buf, d, col_tab[i, d]).start()
                    else:
                        dma_p_in(buf, d, col_tab[i, d]).start()
                # (C/D) r slice for this layer
                if db:
                    @pl.when(i == 0)
                    def _():
                        dma_r_in(buf, i).start()
                else:
                    # single-buffer: the previous layer's r writeback reads
                    # the SAME tile this load overwrites — wait it first
                    # (also keeps rout_sem balanced at one wait per start)
                    @pl.when(i > 0)
                    def _():
                        dma_r_out(buf, i - 1).wait()

                    dma_r_in(buf, i).start()
                for d in range(dmax):
                    dma_p_in(buf, d, col_tab[i, d]).wait()
                dma_r_in(buf, i).wait()

                if db:
                    # (E) free the other r buffer (its writeback), then
                    # (F) prefetch layer i+1: r always safe (disjoint HBM
                    # slices per layer), posterior blocks per the static
                    # conflict table
                    @pl.when(i > 0)
                    def _():
                        dma_r_out(pb, i - 1).wait()

                    @pl.when(i < m_b - 1)
                    def _():
                        dma_r_in(nxtb, i + 1).start()
                        for d in range(dmax):
                            @pl.when(safe_tab[i, d] == 1)
                            def _(d=d):
                                dma_p_in(nxtb, d, col_tab[i + 1, d]).start()

                # (G) compute: check update + delta writeback (+ on-the-fly
                # parity pre-check in lazy mode)
                frozen = done_scr[:]  # [1, bt]; converged lanes stay frozen
                qs = []
                par = jnp.zeros((z, bt), jnp.int32)
                for d in range(dmax):
                    s = shift_tab[i, d]
                    x = _neg_roll(p_tiles[buf, d], s, z)
                    valid = col_tab[i, d] < n_b
                    if lazy:
                        bit = (x <= 0.0).astype(jnp.int32)
                        par = par + jnp.where(valid, bit, 0)
                    q = jnp.where(valid, x - r_tiles[buf, d], 1e30)
                    qs.append(q)
                if lazy:
                    layer_bad = jnp.max((par & 1), axis=0, keepdims=True)
                    pre_bad = jnp.maximum(pre_bad, layer_bad)
                rn = _minsum(qs, cfg)
                keep = frozen.reshape(1, bt) > 0.0
                for d in range(dmax):
                    s = shift_tab[i, d]
                    valid = col_tab[i, d] < n_b
                    live = jnp.logical_and(valid, jnp.logical_not(keep))
                    # delta-accumulate writeback, matching ops/bp.py
                    delta = pltpu.roll(
                        jnp.where(live, rn[d] - r_tiles[buf, d], 0.0), s, 0
                    )
                    p_tiles[buf, d] = p_tiles[buf, d] + delta
                    r_tiles[buf, d] = jnp.where(
                        live, rn[d], r_tiles[buf, d]
                    )
                # (H) writebacks (waited by (A)/(E) of the next layer, or
                # by the post-sweep drain for the last layer)
                for d in range(dmax):
                    dma_p_out(buf, d, col_tab[i, d]).start()
                dma_r_out(buf, i).start()
                return pre_bad

            return step

        steps = [make_step(b) for b in range(nbuf)]

        def layer_body(i, pre_bad):
            if nbuf == 1:
                return steps[0](i, pre_bad)
            return jax.lax.cond(
                jax.lax.rem(i, 2) == 0,
                lambda pb: steps[0](i, pb),
                lambda pb: steps[1](i, pb),
                pre_bad,
            )

        def drain_sweep():
            last = (m_b - 1) % nbuf
            for d in range(dmax):
                dma_p_out(last, d, col_tab[m_b - 1, d]).wait()
            dma_r_out(last, m_b - 1).wait()

        def syndrome(_):
            """Exact end-of-sweep syndrome: posterior blocks only."""
            def layer_syn(i, fail):
                for d in range(dmax):
                    dma_p_in(0, d, col_tab[i, d]).start()
                for d in range(dmax):
                    dma_p_in(0, d, col_tab[i, d]).wait()
                par = jnp.zeros((z, bt), jnp.int32)
                for d in range(dmax):
                    s = shift_tab[i, d]
                    bit = (_neg_roll(p_tiles[0, d], s, z) <= 0.0).astype(
                        jnp.int32
                    )
                    par = par + jnp.where(col_tab[i, d] < n_b, bit, 0)
                f = jnp.max((par & 1).astype(jnp.float32), axis=0,
                            keepdims=True)
                return jnp.maximum(fail, f)

            return jax.lax.fori_loop(0, m_b, layer_syn,
                                     jnp.zeros((1, bt), jnp.float32))

        def body(carry):
            t, _ = carry
            pre_bad = jax.lax.fori_loop(
                0, m_b, layer_body, jnp.zeros((1, bt), jnp.int32)
            )
            drain_sweep()
            done = done_scr[:]
            d32 = done.astype(jnp.int32)
            iters_ref[:] = iters_ref[:] * d32 + (t + 1) * (1 - d32)
            if lazy:
                # run the expensive exact pass only when some live lane's
                # on-the-fly check passed; done is latched ONLY by the
                # exact syndrome, preserving converged => valid codeword
                cand = (1.0 - done) * (1.0 - pre_bad.astype(jnp.float32))

                @pl.when(jnp.max(cand) > 0.0)
                def _():
                    fail = syndrome(None)
                    done_scr[:] = jnp.maximum(done_scr[:], 1.0 - fail)
            else:
                fail = syndrome(None)  # [1, bt]: 1.0 = some check fails
                done_scr[:] = jnp.maximum(done, 1.0 - fail)
            return t + 1, jnp.sum(done_scr[:])

        def cond(carry):
            t, n_done = carry
            c = t < cfg.max_iters
            if cfg.early_exit:
                c = jnp.logical_and(c, n_done < float(bt))
            return c

        t_end, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(0.0))
        )
        conv_ref[:] = (done_scr[:] > 0.0).astype(jnp.int8)
        texec_ref[:] = jnp.full_like(texec_ref, t_end)

        # ---- final hard decisions: stream posterior out as bits -------
        def out_block(j, _):
            cp = pltpu.make_async_copy(
                p_hbm.at[j, :, lane], p_tiles.at[0, 0], misc_sem
            )
            cp.start()
            cp.wait()
            bits_vmem[0] = (p_tiles[0, 0] <= 0.0).astype(jnp.int8)
            wr = pltpu.make_async_copy(
                bits_vmem.at[0], bits_hbm.at[j, :, lane], misc_sem
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, n_b, out_block, 0)

    return kernel


def _pick_nbuf(z: int, dmax: int) -> int:
    """Two tile sets when the doubled working set stays well under the
    raisable scoped-VMEM ceiling (the working set is two layers' worth —
    tiny next to the code, so this is almost always 2)."""
    per_buf = 2 * dmax * z * _LANES * 4  # p_tiles + r_tiles, f32
    return 2 if 2 * per_buf + (z * _LANES) + (1 << 20) <= 48 * (1 << 20) else 1


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def decode_qc_stream(code: QCCode, cfg: DecoderConfig, llr: jax.Array,
                     interpret: bool = False):
    """Decode [B, n] LLRs with the streaming kernel; same DecodeResult
    contract as the other implementations."""
    from .bp import DecodeResult

    if not stream_supported(code, cfg):
        raise NotImplementedError("streaming kernel: layered min-sum f32 only")
    n_b, z = code.n_b, code.z
    b = llr.shape[0]
    # the lane tile is always a full 128: HBM DMA slices on the lane
    # dimension must be 128-aligned on hardware (Mosaic rejects smaller
    # tiles: "Slice shape along dimension 2 must be aligned to tiling") —
    # small batches pad up and the pad lanes converge on iteration 1
    bt = _LANES
    pad = (-b) % bt
    # large-positive pad LLRs: pad lanes converge to all-zeros on iteration
    # 1 so partial tiles keep the early exit (see pallas_bp.decode_qc_pallas)
    llr_p = jnp.pad(llr.astype(jnp.float32), ((0, pad), (0, 0)),
                    constant_values=1e4)
    bp = b + pad
    chan = llr_p.T.reshape(n_b, z, bp)
    col_tab, shift_tab, dmax = _tables(code)
    nbuf = _pick_nbuf(z, dmax)
    safe_tab = (_safe_table(col_tab, n_b) if nbuf == 2
                else np.zeros_like(col_tab))

    kernel = _build_stream_kernel(code, cfg, bt, dmax, nbuf)
    out_shape = (
        jax.ShapeDtypeStruct((n_b, z, bp), jnp.int8),            # bits (HBM)
        jax.ShapeDtypeStruct((1, bp), jnp.int8),                  # converged
        jax.ShapeDtypeStruct((1, bp), jnp.int32),                 # iterations
        jax.ShapeDtypeStruct((1, bp), jnp.int32),                 # executed
        jax.ShapeDtypeStruct((n_b + 1, z, bp), jnp.float32),       # p workspace (+1 dummy block for pad slots)
        jax.ShapeDtypeStruct((code.m_b, dmax, z, bp), jnp.float32),  # r ws
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    lane_block = lambda i: (0, i)
    vout = pl.BlockSpec((1, bt), lane_block, memory_space=pltpu.VMEM)
    bits, conv, iters, texec, _, _ = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[smem, smem, smem, anys],
        out_specs=(anys, vout, vout, vout, anys, anys),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nbuf, dmax, z, bt), jnp.float32),   # p tiles
            pltpu.VMEM((nbuf, dmax, z, bt), jnp.float32),   # r tiles
            pltpu.VMEM((1, bt), jnp.float32),               # done mask
            pltpu.VMEM((1, z, bt), jnp.int8),               # bits staging
            pltpu.SemaphoreType.DMA((nbuf, dmax)),          # p in
            pltpu.SemaphoreType.DMA((nbuf, dmax)),          # p out
            pltpu.SemaphoreType.DMA((nbuf,)),               # r in
            pltpu.SemaphoreType.DMA((nbuf,)),               # r out
            pltpu.SemaphoreType.DMA(()),                    # init/output
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # tiles share HBM workspaces
            # tile sets can exceed the 16 MB default scoped-VMEM limit for
            # wide/huge layers; request a margined estimate like the z-lane
            # kernel does (62.5 MB verified working on v5e)
            vmem_limit_bytes=min(
                64 * (1 << 20),
                max(16 * (1 << 20),
                    int((2 * nbuf * dmax * z * bt * 4 + z * bt) * 1.6)),
            ),
        ),
        interpret=interpret,
    )(jnp.asarray(col_tab), jnp.asarray(shift_tab), jnp.asarray(safe_tab),
      chan)

    bits_bn = bits.reshape(n_b * z, bp).T[:b].astype(jnp.uint8)
    return DecodeResult(
        bits=bits_bn,
        converged=conv[0, :b] > 0,
        iterations=iters[0, :b],
        total_iters=jnp.max(texec[0]),
    )


def _minsum(qs, cfg: DecoderConfig):
    # NOTE: same math as pallas_bp._check_update_rows but expressed as a
    # streaming running-min (m1/m2 updated per loaded tile instead of over
    # a co-resident list) — the two must stay numerically equivalent (the
    # bit-exactness tests vs the jnp path pin both)
    m1 = jnp.full_like(qs[0], 1e30)
    m2 = jnp.full_like(qs[0], 1e30)
    sgn = jnp.ones_like(qs[0])
    absq = []
    for q in qs:
        a = jnp.abs(q)
        absq.append(a)
        m2 = jnp.minimum(m2, jnp.maximum(m1, a))
        m1 = jnp.minimum(m1, a)
        sgn = sgn * jnp.where(q < 0, -1.0, 1.0)
    out = []
    for q, a in zip(qs, absq):
        mag = jnp.where(a == m1, m2, m1)
        if cfg.offset:
            mag = jnp.maximum(mag - cfg.offset, 0.0)
        if cfg.normalization != 1.0:
            mag = cfg.normalization * mag
        out.append(sgn * jnp.where(q < 0, -1.0, 1.0) * mag)
    return out
