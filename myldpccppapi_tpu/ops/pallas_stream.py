"""Streaming fused decoder for long codes (HBM-resident state, layer DMA).

The VMEM-resident kernel (ops/pallas_bp.py) requires the whole working set
— posterior + messages — on chip at the mandatory 128-lane tile, which caps
it at n ≈ 6000.  This kernel keeps the posterior and check messages in HBM
workspaces and DMAs one LAYER's working set (~2 MB for z=360, degree ~10)
into VMEM at a time: the streaming evolution of the reference's fused
decoders for codes that outgrow local memory, and the TPU analogue of what
DVB-S2 hardware decoders do with DDR + row banks.

Layered min-sum only (the configuration long codes use).  Early-exit
semantics are implemented by FREEZING converged lanes (their posterior and
messages stop updating), which is exactly equivalent to the other paths'
output latching because codeword lanes are independent.

Status: bit-exact vs the jnp path ON HARDWARE (v5e, wimax n=1152, incl.
iteration counts and under the triage wrapper) as well as in interpret
mode; plain single-circulant QC codes only (``stream_supported`` refuses
multi-edge/masked structures — the z-lane kernel owns those).  Remaining
performance work: double-buffered DMA across non-conflicting layers.
Opt in with ``DecoderConfig(implementation="pallas_stream")``.
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
    if code.extra_blocks is not None or getattr(code, "masked_rows", None):
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


def _build_stream_kernel(code: QCCode, cfg: DecoderConfig, bt: int, dmax: int):
    z = code.z
    m_b, n_b = code.m_b, code.n_b

    def kernel(col_tab, shift_tab, chan_hbm, bits_hbm, conv_ref, iters_ref,
               texec_ref, p_hbm, r_hbm, p_tiles, r_tile, done_scr, bits_vmem,
               sems):
        # refs: chan/bits/p/r in HBM (pl.ANY); p_tiles [dmax, z, bt] VMEM,
        # r_tile [dmax, z, bt] VMEM, done_scr [1, bt] VMEM, bits_vmem
        # [1, z, bt] int8 staging, sems: DMA sems [dmax + 1].
        off = pl.program_id(0) * bt
        lane = pl.ds(off, bt)

        def dma_p_in(d, j):
            return pltpu.make_async_copy(
                p_hbm.at[j, :, lane], p_tiles.at[d], sems.at[d]
            )

        def dma_p_out(d, j):
            return pltpu.make_async_copy(
                p_tiles.at[d], p_hbm.at[j, :, lane], sems.at[d]
            )

        # ---- init: posterior = channel, messages = 0 ------------------
        def init_block(j, _):
            cp = pltpu.make_async_copy(
                chan_hbm.at[j, :, lane], p_tiles.at[0], sems.at[0]
            )
            cp.start()
            cp.wait()
            wr = pltpu.make_async_copy(
                p_tiles.at[0], p_hbm.at[j, :, lane], sems.at[0]
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, n_b, init_block, 0)
        # zero the dummy pad block too
        p_tiles[0] = jnp.zeros_like(p_tiles[0])
        zb = pltpu.make_async_copy(p_tiles.at[0], p_hbm.at[n_b, :, lane], sems.at[0])
        zb.start()
        zb.wait()
        r_tile[:] = jnp.zeros_like(r_tile)

        def init_r(i, _):
            wr = pltpu.make_async_copy(
                r_tile, r_hbm.at[i, :, :, lane], sems.at[0]
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, m_b, init_r, 0)
        done_scr[:] = jnp.zeros_like(done_scr)
        iters_ref[:] = jnp.zeros_like(iters_ref)

        def load_layer(i):
            """DMA this layer's p blocks and r slice into VMEM."""
            # pad slots read/write the dummy block n_b — never a real column
            for d in range(dmax):
                dma_p_in(d, col_tab[i, d]).start()
            rin = pltpu.make_async_copy(
                r_hbm.at[i, :, :, lane], r_tile, sems.at[dmax]
            )
            rin.start()
            for d in range(dmax):
                dma_p_in(d, col_tab[i, d]).wait()
            rin.wait()

        def store_layer(i):
            for d in range(dmax):
                dma_p_out(d, col_tab[i, d]).start()
            rout = pltpu.make_async_copy(
                r_tile, r_hbm.at[i, :, :, lane], sems.at[dmax]
            )
            rout.start()
            for d in range(dmax):
                dma_p_out(d, col_tab[i, d]).wait()
            rout.wait()

        def layer_update(i, _):
            load_layer(i)
            frozen = done_scr[:]  # [1, bt]; converged lanes stay frozen
            qs = []
            for d in range(dmax):
                s = shift_tab[i, d]
                q = _neg_roll(p_tiles[d], s, z) - r_tile[d]
                q = jnp.where(col_tab[i, d] < n_b, q, 1e30)
                qs.append(q)
            rn = _minsum(qs, cfg)
            keep = frozen.reshape(1, bt) > 0.0
            for d in range(dmax):
                s = shift_tab[i, d]
                valid = col_tab[i, d] < n_b
                live = jnp.logical_and(valid, jnp.logical_not(keep))
                # delta-accumulate writeback, matching ops/bp.py bit-exactly
                delta = pltpu.roll(
                    jnp.where(live, rn[d] - r_tile[d], 0.0), s, 0
                )
                p_tiles[d] = p_tiles[d] + delta
                r_tile[d] = jnp.where(live, rn[d], r_tile[d])
            store_layer(i)
            return 0

        def syndrome(_):
            def layer_syn(i, fail):
                load_layer(i)
                par = jnp.zeros((z, bt), jnp.int32)
                for d in range(dmax):
                    s = shift_tab[i, d]
                    bit = (_neg_roll(p_tiles[d], s, z) <= 0.0).astype(jnp.int32)
                    par = par + jnp.where(col_tab[i, d] < n_b, bit, 0)
                f = jnp.max((par & 1).astype(jnp.float32), axis=0, keepdims=True)
                return jnp.maximum(fail, f)

            return jax.lax.fori_loop(0, m_b, layer_syn,
                                     jnp.zeros((1, bt), jnp.float32))

        def body(carry):
            t, _ = carry
            jax.lax.fori_loop(0, m_b, layer_update, 0)
            fail = syndrome(None)
            done = done_scr[:]
            d32 = done.astype(jnp.int32)
            iters_ref[:] = iters_ref[:] * d32 + (t + 1) * (1 - d32)
            done = jnp.maximum(done, 1.0 - fail)
            done_scr[:] = done
            return t + 1, jnp.sum(done)

        def cond(carry):
            t, n_done = carry
            c = t < cfg.max_iters
            if cfg.early_exit:
                c = jnp.logical_and(c, n_done < float(bt))
            return c

        t_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
        conv_ref[:] = (done_scr[:] > 0.0).astype(jnp.int8)
        texec_ref[:] = jnp.full_like(texec_ref, t_end)

        # ---- final hard decisions: stream posterior out as bits -------
        def out_block(j, _):
            cp = pltpu.make_async_copy(
                p_hbm.at[j, :, lane], p_tiles.at[0], sems.at[0]
            )
            cp.start()
            cp.wait()
            bits_vmem[0] = (p_tiles[0] <= 0.0).astype(jnp.int8)
            wr = pltpu.make_async_copy(
                bits_vmem.at[0], bits_hbm.at[j, :, lane], sems.at[0]
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, n_b, out_block, 0)

    return kernel


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

    kernel = _build_stream_kernel(code, cfg, bt, dmax)
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
        in_specs=[smem, smem, anys],
        out_specs=(anys, vout, vout, vout, anys, anys),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dmax, z, bt), jnp.float32),   # p tiles
            pltpu.VMEM((dmax, z, bt), jnp.float32),   # r tile
            pltpu.VMEM((1, bt), jnp.float32),         # done mask
            pltpu.VMEM((1, z, bt), jnp.int8),         # bits staging
            pltpu.SemaphoreType.DMA((dmax + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # tiles share HBM workspaces
        ),
        interpret=interpret,
    )(jnp.asarray(col_tab), jnp.asarray(shift_tab), chan)

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
