"""Fused z-on-lanes Pallas decoder: long QC codes entirely VMEM-resident.

The [z, lanes] kernel in :mod:`ops.pallas_bp` puts the codeword batch on the
128-lane axis, so its working set scales as ``128 * (2n + edges)`` floats and
caps out near n ~ 6000.  This kernel transposes the layout: the **lifting
dimension z goes on the lane axis** (padded to a multiple of 128) and a small
batch tile (8 codewords for f32, 16 for bf16 — exactly one sublane tile)
replaces the lane batch.  The working set then scales with the batch *tile*,
not 128 lanes, and even DVB-S2 n=64800 fits in VMEM:

    posterior  [n_b, bt, zp]   180*8*384*4  = 2.2 MB
    messages   [E_b, bt, zp]   ~630*8*384*4 = 7.7 MB

so the whole iterative decode — check updates, delta writebacks, syndrome,
early exit — runs in ONE kernel with zero HBM traffic per iteration, versus
the jnp/XLA path that streams ~0.5 GB of message state per iteration from
HBM.  This supersedes the HBM-streaming kernel (ops/pallas_stream.py) for
every code whose per-tile state fits VMEM, i.e. all DVB-S2 and 5G NR
configurations; it is the TPU answer to the reference's fused one-work-group
decoders (``decodeOnceTDMP``/``decodeOnceMS``, ``decodeCL.c:307-567``) on
codes far beyond the reference's local-memory reach.

Design notes:

* Every circulant alignment is a **static lane roll** (the base structure is
  unrolled at trace time), so none of the dynamic-roll hazards of the
  table-driven kernel apply, and there are no gathers anywhere.
* When z is not a lane multiple (DVB-S2: z=360, zp=384) a roll-within-z is
  two static rolls and a lane select; pad lanes hold garbage but are never
  read into real lanes (both roll branches index lanes < z) and are masked
  out of the syndrome reduction.
* **Relative alignment tracking** halves the roll count: the posterior block
  of column j is stored in the row-alignment of the LAST edge that updated
  it (a statically known map, stationary across sweeps), so each edge read
  rolls by the *relative* shift from the previous edge and the delta
  writeback needs no roll at all.
* Writebacks are delta-accumulate (``p[j] += r_new - r_old``) in the exact
  expression and order of ops/bp.py's layered sweep, so results are
  bit-identical to the jnp path — including multi-edge blocks (several
  circulants in one base cell) and row-masked partial circulants, which the
  EN 302 307 DVB-S2 structure requires.
* Early termination freezes the posterior of converged codewords (the delta
  is multiplied by a per-sublane live mask), which latches their output bits
  and keeps their syndrome satisfied — the reference's ``isDones`` semantics
  (``decodeCL.c:27-28,296-300``) expressed functionally.
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
from .pallas_bp import _check_update_rows

__all__ = ["zlane_supported", "decode_qc_zlane", "zlane_vmem_bytes"]

_LANE = 128
_PAD_LLR = 1e4   # batch/lane padding: converges to all-zeros on iteration 1
_Q_INF = 1e30    # masked-row q magnitude: the min-sum / phi identity
_VMEM_BUDGET = 13 * 1024 * 1024  # bf16 16-tile gate vs the 16 MB default
#: Mosaic's stack for the unrolled sweep exceeds the storage estimate by up
#: to ~1.55x (measured: DVB-S2 64800 r3/4 f32 needs 17.04 MB scoped where
#: the storage model says 11.04 MB) — dense layers keep more per-edge
#: temporaries live.  The kernel raises vmem_limit_bytes to the margined
#: estimate; _VMEM_CEILING caps what we will request.  Verified on this
#: v5e chip: a 62.5 MB request (plain-QC n=153,600, ~31 MB storage
#: estimate) compiles and decodes bit-exactly at 967 Mbit/s marginal —
#: 10x the HBM-streaming tier on the same code — so the ceiling sits at
#: 64 MB; a genuinely over-physical request fails loudly at compile, not
#: silently.
_VMEM_MARGIN = 1.6
_VMEM_CEILING = 64 * 1024 * 1024
_VMEM_DEFAULT_LIMIT = 16 * 1024 * 1024


def _vmem_limit(code: QCCode, cfg: DecoderConfig) -> "int | None":
    """vmem_limit_bytes to request: None when the default 16 MB scoped
    limit suffices.  The REQUEST is more generous (2x estimate) than the
    support gate's expectation (_VMEM_MARGIN): the limit is a compile-time
    cap, not a reservation, so over-asking costs nothing while
    under-asking turns a borderline code into a compile failure (the worst
    measured Mosaic overshoot is 1.544x — too close to a 1.6x request)."""
    need = int(zlane_vmem_bytes(code, cfg) * _VMEM_MARGIN) + (1 << 20)
    if need <= _VMEM_DEFAULT_LIMIT:
        return None
    ask = int(zlane_vmem_bytes(code, cfg) * 2.0) + (1 << 20)
    return min(ask, _VMEM_CEILING)


def _pad_z(z: int) -> int:
    return -(-z // _LANE) * _LANE


def _batch_tile(code: QCCode, cfg: DecoderConfig) -> int:
    """Codeword sublane tile: f32 packs 8 sublanes; bf16 storage prefers a
    16-codeword tile but falls back to 8 when the larger tile might blow
    the scoped-VMEM limit.  The fall-back rule is pessimistic — the bf16
    state must fit even charged at f32 width — because Mosaic's stack
    allocation for the upcast temporaries of a deeply unrolled bf16 sweep
    is far larger than the storage itself (measured: an 18.4 MB scoped-
    vmem compile failure at bt=16 on DVB-S2 n=64800 in lazy mode whose
    bf16 storage is only 10 MB)."""
    if cfg.msg_dtype == "bfloat16":
        if zlane_vmem_bytes(code, cfg, bt=16, itemsize=4) <= _VMEM_BUDGET:
            return 16
    return 8


def zlane_vmem_bytes(code: QCCode, cfg: DecoderConfig, bt=None,
                     itemsize=None) -> int:
    """Kernel working-set estimate: posterior + messages (storage dtype) +
    bits out x2 (int8, double-buffered by the pipeline) + the widest
    layer's live f32 edge tiles (row-aligned q list and new check
    messages, co-live before writeback) + (soft_output) the posterior
    output block x2 in the storage dtype."""
    zp = _pad_z(code.z)
    if itemsize is None:
        itemsize = 2 if cfg.msg_dtype == "bfloat16" else 4
    if bt is None:
        bt = _batch_tile(code, cfg)
    state = (code.n_b + code.num_blocks) * bt * zp * itemsize
    bits_out = 2 * code.n_b * bt * zp
    if cfg.soft_output:
        bits_out += 2 * code.n_b * bt * zp * itemsize
    widest = int(np.diff(np.asarray(code.layer_ptr)).max())
    stack = 2 * widest * bt * zp * 4
    if cfg.syndrome_mode == "lazy":
        stack += 2 * bt * zp * 4  # pre_bad/par i32 accumulators
    return state + bits_out + stack + 4096


def zlane_supported(code, cfg: DecoderConfig) -> bool:
    if not isinstance(code, QCCode):
        return False
    if cfg.schedule != "layered":
        return False
    if code.z < 64:  # below half a lane tile the layout wastes the VPU
        return False
    # margined estimate must fit the raisable scoped-VMEM ceiling
    need = int(zlane_vmem_bytes(code, cfg) * _VMEM_MARGIN) + (1 << 20)
    return need <= _VMEM_CEILING


def _rel_roll(x: jax.Array, d: int, z: int, zp: int) -> jax.Array:
    """Advance row-alignment by +d within logical width z (static shift):
    ``y[..., i] = x[..., (i + d) % z]`` for lanes i < z; pad lanes i >= z
    are don't-care but are never fed by them either (both branches read
    lanes < z only)."""
    d = d % z
    if d == 0:
        return x
    if z == zp:
        return pltpu.roll(x, zp - d, 1)
    a = pltpu.roll(x, zp - d, 1)   # right by z-d via full-width wrap
    b = pltpu.roll(x, z - d, 1)    # fixes the z..zp seam for i >= z-d
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < z - d, a, b)


def _plan(code: QCCode):
    """Static sweep plan with relative alignment tracking.

    Returns (layers, align0):
      layers[i] = list of column groups [(j, [(e, shift, rel_read, mask)])]
        where ``rel_read`` advances the alignment from the previous edge on
        that column (or from the stored alignment for the first edge);
      align0[j] = stored row-alignment of column j at sweep boundaries
        (the last edge of the sweep that touches j — stationary across
        iterations by construction).
    """
    br, bc, sh = code.blocks
    masks = code.block_row_masks
    ptr = code.layer_ptr
    align0 = {}
    for e in range(len(br)):
        align0[int(bc[e])] = int(sh[e])
    align = dict(align0)
    layers = []
    for i in range(code.m_b):
        p0, p1 = int(ptr[i]), int(ptr[i + 1])
        groups = []
        e = p0
        while e < p1:
            j = int(bc[e])
            group = []
            prev = align.get(j, 0)
            while e < p1 and int(bc[e]) == j:
                s = int(sh[e])
                group.append((e, s, (s - prev) % code.z, masks[e]))
                prev = s
                e += 1
            align[j] = prev
            groups.append((j, group))
        layers.append(groups)
    assert align == align0, "sweep alignment must be stationary"
    return layers, align0


def _build_kernel(code: QCCode, cfg: DecoderConfig, bt: int, dtype):
    from .pallas_bp import _layer_weights

    z, zp = code.z, _pad_z(code.z)
    n_b = code.n_b
    layers, align0 = _plan(code)
    lw = _layer_weights(cfg, code.m_b)
    # syndrome plan: per layer, (j, roll from stored alignment, mask)
    syn_layers = [
        [(j, (s - align0[j]) % z, mask) for (j, group) in groups
         for (_, s, _, mask) in group]
        for groups in layers
    ]

    def mconst(mask):
        """bool[z] live-row mask -> [1, zp] lane mask, built from iota
        comparisons (Pallas kernels cannot capture array constants; real
        masks exclude only a handful of rows, e.g. the DVB-S2 wrap block's
        row 0)."""
        excluded = np.nonzero(~np.asarray(mask))[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, zp), 1)
        m = lane < z
        for r in excluded:
            m = jnp.logical_and(m, lane != int(r))
        return m

    soft = cfg.soft_output

    def kernel(chan_hbm, bits_ref, conv_ref, iters_ref, texec_ref,
               *post_and_scratch):
        if soft:
            post_ref, p_scr, r_scr, done_scr, sem = post_and_scratch
        else:
            p_scr, r_scr, done_scr, sem = post_and_scratch
        off = pl.program_id(0) * bt
        # ---- init: DMA channel LLRs into the posterior, pre-roll each
        # column block to its steady-state alignment
        cp = pltpu.make_async_copy(
            chan_hbm.at[:, pl.ds(off, bt), :], p_scr, sem
        )
        cp.start()
        cp.wait()
        # All tile math (incl. rolls) runs in f32: Mosaic has no sub-32-bit
        # lane rotate ("Rotate with non-32-bit data"), and the VPU is
        # f32-native anyway — bf16 is a STORAGE format here (halves VMEM,
        # doubling the codeword tile), converted at the register boundary.
        f32 = jnp.float32
        for j in range(n_b):
            a = align0.get(j, 0)
            if a:
                p_scr[j] = _rel_roll(
                    p_scr[j].astype(f32), a, z, zp
                ).astype(dtype)
        r_scr[:] = jnp.zeros_like(r_scr)
        done_scr[:] = jnp.zeros_like(done_scr)
        iters_ref[:] = jnp.zeros_like(iters_ref)

        real_lane = jax.lax.broadcasted_iota(jnp.int32, (bt, zp), 1) < z
        lazy = cfg.syndrome_mode == "lazy"

        def sweep():
            live = 1.0 - done_scr[:]  # [bt, 1] freeze mask, f32
            # lazy mode: on-the-fly convergence pre-check — the sign of the
            # row-aligned posterior each edge reads anyway, folded per layer
            # (classic TDMP on-the-fly syndrome; zero extra rolls)
            pre_bad = jnp.zeros((bt, zp), jnp.int32)
            for li, groups in enumerate(layers):
                par = jnp.zeros((bt, zp), jnp.int32)
                qs = []
                xs = {}
                for (j, group) in groups:
                    x = p_scr[j].astype(f32)
                    for (e, s, rel, mask) in group:
                        x = _rel_roll(x, rel, z, zp)
                        if lazy:
                            bit = (x <= 0.0).astype(jnp.int32)
                            if mask is not None:
                                bit = jnp.where(mconst(mask), bit, 0)
                            par = par + bit
                        q = x - r_scr[e].astype(f32)
                        if mask is not None:
                            q = jnp.where(mconst(mask), q, _Q_INF)
                        qs.append(q)
                    xs[j] = x
                # round messages to the storage dtype BEFORE the delta so the
                # accumulated posterior stays exactly consistent with the
                # stored r (the jnp bf16 path rounds at the same point)
                rn = [
                    x.astype(dtype)
                    for x in _check_update_rows(
                        qs, cfg, None if lw is None else lw[li]
                    )
                ]
                idx = 0
                for (j, group) in groups:
                    y = xs[j]
                    s_last = group[-1][1]
                    for (e, s, rel, mask) in group:
                        delta = rn[idx].astype(f32) - r_scr[e].astype(f32)
                        if mask is not None:
                            delta = jnp.where(mconst(mask), delta, 0.0)
                        y = y + _rel_roll(delta * live, (s_last - s) % z, z, zp)
                        r_scr[e] = rn[idx]
                        idx += 1
                    p_scr[j] = y.astype(dtype)
                if lazy:
                    pre_bad = pre_bad | (par & 1)
            return pre_bad

        def syndrome():
            bad = jnp.zeros((bt, zp), jnp.int32)
            for entries in syn_layers:
                par = jnp.zeros((bt, zp), jnp.int32)
                for (j, rel, mask) in entries:
                    bit = (
                        _rel_roll(p_scr[j].astype(f32), rel, z, zp) <= 0.0
                    ).astype(jnp.int32)
                    if mask is not None:
                        bit = jnp.where(mconst(mask), bit, 0)
                    par = par + bit
                bad = bad | (par & 1)
            bad = jnp.where(real_lane, bad, 0)
            return jnp.max(bad, axis=1, keepdims=True).astype(jnp.float32)

        def body(carry):
            t, _ = carry
            pre_bad = sweep()
            done = done_scr[:]
            d32 = done.astype(jnp.int32)
            iters_ref[:] = iters_ref[:] * d32 + (t + 1) * (1 - d32)
            if lazy:
                pre_bad = jnp.where(real_lane, pre_bad, 0)
                pre_fail = jnp.max(pre_bad, axis=1, keepdims=True)
                cand = (1.0 - done) * (1.0 - pre_fail.astype(jnp.float32))

                # run the expensive exact pass only when some live frame's
                # on-the-fly check passed; done is latched ONLY by the
                # exact syndrome, preserving converged => valid codeword
                @pl.when(jnp.max(cand) > 0.0)
                def _():
                    fail = syndrome()
                    done_scr[:] = jnp.maximum(done_scr[:], 1.0 - fail)
            else:
                fail = syndrome()      # [bt, 1]: 1.0 = some check fails
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
        # final hard decisions, rolled back to canonical column alignment.
        # The early-exit freeze (delta * live) means p_scr holds each
        # converged frame's posterior AT ITS CONVERGENCE SWEEP — exactly the
        # jnp path's per-frame latched post_out — so the soft output is one
        # extra store per block, sharing the canonical roll with the bits
        # (the refreshPostPMS analogue, decodeCL.c:149-171, at kernel rate).
        for j in range(n_b):
            a = align0.get(j, 0)
            p32 = p_scr[j].astype(f32)
            c = _rel_roll(p32, (z - a) % z, z, zp) if a else p32
            bits_ref[j] = (c <= 0.0).astype(jnp.int8)
            if soft:
                post_ref[j] = c.astype(dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def decode_qc_zlane(code: QCCode, cfg: DecoderConfig, llr: jax.Array,
                    interpret: bool = False):
    """Decode [B, n] channel LLRs; same DecodeResult contract as
    :func:`myldpccppapi_tpu.ops.bp.decode_qc` and bit-identical to it."""
    from .bp import DecodeResult

    if cfg.schedule != "layered":
        raise NotImplementedError("z-lane kernel supports layered schedules")
    z, n_b = code.z, code.n_b
    zp = _pad_z(z)
    dtype = jnp.bfloat16 if cfg.msg_dtype == "bfloat16" else jnp.float32
    bt = _batch_tile(code, cfg)
    b = llr.shape[0]
    pad = (-b) % bt
    llr_p = jnp.pad(llr.astype(dtype), ((0, pad), (0, 0)),
                    constant_values=_PAD_LLR)
    bp_ = b + pad
    chan = llr_p.reshape(bp_, n_b, z).transpose(1, 0, 2)  # [n_b, B, z]
    if zp > z:
        chan = jnp.pad(chan, ((0, 0), (0, 0), (0, zp - z)),
                       constant_values=_PAD_LLR)
    grid = (bp_ // bt,)
    out_shape = [
        jax.ShapeDtypeStruct((n_b, bp_, zp), jnp.int8),  # bits (canonical)
        jax.ShapeDtypeStruct((bp_, 1), jnp.int8),         # converged
        jax.ShapeDtypeStruct((bp_, 1), jnp.int32),        # iterations
        jax.ShapeDtypeStruct((bp_, 1), jnp.int32),        # executed per tile
    ]
    kernel = _build_kernel(code, cfg, bt, dtype)
    scalar_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    block_spec = pl.BlockSpec((n_b, bt, zp), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [block_spec, scalar_spec, scalar_spec, scalar_spec]
    if cfg.soft_output:
        # posterior LLRs, canonical alignment, latched at convergence like
        # the bits (storage dtype)
        out_shape.append(jax.ShapeDtypeStruct((n_b, bp_, zp), dtype))
        out_specs.append(block_spec)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # chan stays in HBM
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((n_b, bt, zp), dtype),              # posterior
            pltpu.VMEM((code.num_blocks, bt, zp), dtype),  # R messages
            pltpu.VMEM((bt, 1), jnp.float32),              # done mask
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # tiles are independent
            # dense codes (DVB-S2 high rates) need more than the 16 MB
            # default scoped limit; see _vmem_limit
            vmem_limit_bytes=_vmem_limit(code, cfg),
        ),
        interpret=interpret,
    )(chan)
    bits, conv, iters, texec = outs[:4]
    bits_bn = bits[:, :b, :z].transpose(1, 0, 2).reshape(b, n_b * z)
    posteriors = None
    if cfg.soft_output:
        posteriors = outs[4][:, :b, :z].transpose(1, 0, 2).reshape(b, n_b * z)
    return DecodeResult(
        bits=bits_bn.astype(jnp.uint8),
        converged=conv[:b, 0] > 0,
        iterations=iters[:b, 0],
        total_iters=jnp.max(texec[:, 0]),
        posteriors=posteriors,
    )
