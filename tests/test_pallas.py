"""Fused Pallas kernel parity vs the jnp/XLA path (interpret mode on CPU).

On TPU the same kernel compiles natively; these tests pin the numerics:
bit-exact decode, identical per-codeword iteration counts and convergence
flags for both schedules — i.e. the fused kernel is a faithful drop-in for
ops/bp.py just as the reference's fused decoders mirror its host-driven
paths (decodeCL.c:307-567 vs 113-300).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myldpccppapi_tpu import DecoderConfig, Encoder, wimax
from myldpccppapi_tpu.codes import encode_numpy
from myldpccppapi_tpu.ops.bp import decode_qc
from myldpccppapi_tpu.ops.channel import transmit
from myldpccppapi_tpu.ops.pallas_bp import choose_batch_tile, decode_qc_pallas


def _case(code, batch, snr_db, seed=0):
    enc = Encoder(code)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    llr, _ = transmit(jax.random.PRNGKey(seed), jnp.asarray(c), snr_db=snr_db)
    return u, jnp.asarray(llr)


@pytest.mark.slow
@pytest.mark.parametrize("schedule", ["layered", "flooding"])
def test_pallas_matches_jnp_bitexact(schedule):
    code = wimax(576, "3/4B")
    _, llr = _case(code, batch=16, snr_db=5.0)
    cfg = DecoderConfig(schedule=schedule)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_pallas(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    assert (np.asarray(res.iterations) == np.asarray(ref.iterations)).all()
    assert (np.asarray(res.converged) == np.asarray(ref.converged)).all()


def test_pallas_batch_padding():
    """Batch sizes that are not a multiple of the lane tile must still work."""
    code = wimax(576, "1/2")
    u, llr = _case(code, batch=5, snr_db=5.0, seed=3)
    cfg = DecoderConfig(schedule="layered")
    res = decode_qc_pallas(code, cfg, llr, True)
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.bits)[:, : code.k] == u).all()


def test_pallas_scms_matches_jnp_bitexact():
    """SCMS on the fused flooding kernel: the message scratch holds the
    previously SENT q (erasures included) instead of R — bit-exact vs the
    jnp path's explicit q carry at an SNR deep enough that erasures fire."""
    code = wimax(576, "1/2")
    _, llr = _case(code, batch=16, snr_db=2.0, seed=7)
    cfg = DecoderConfig(schedule="flooding", self_correction=True,
                        max_iters=10)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_pallas(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    assert (np.asarray(res.iterations) == np.asarray(ref.iterations)).all()
    assert (np.asarray(res.converged) == np.asarray(ref.converged)).all()
    # the flag must actually reach the kernel: at 2.0 dB / 10 iters the
    # erasure rule changes outcomes vs plain min-sum (FER 0.365 -> 0.252
    # measured; a silent plain-MS fallthrough would be bit-identical)
    plain = decode_qc_pallas(
        code, DecoderConfig(schedule="flooding", max_iters=10), llr, True)
    assert not (np.asarray(res.bits) == np.asarray(plain.bits)).all()


@pytest.mark.slow
def test_pallas_scms_soft_output_matches_jnp():
    """SCMS + latched posterior output on the fused kernel."""
    code = wimax(576, "1/2")
    _, llr = _case(code, batch=8, snr_db=2.5, seed=11)
    cfg = DecoderConfig(schedule="flooding", self_correction=True,
                        max_iters=8, soft_output=True)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_pallas(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    np.testing.assert_array_equal(
        np.asarray(res.posteriors), np.asarray(ref.posteriors))


@pytest.mark.slow
def test_pallas_normalized_minsum():
    code = wimax(576, "1/2")
    u, llr = _case(code, batch=8, snr_db=4.0, seed=1)
    cfg = DecoderConfig(schedule="layered", normalization=0.75)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_pallas(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()


@pytest.mark.slow
def test_dyn_kernel_matches_jnp_on_nr():
    """Large base graphs (> _DYN_BLOCK_THRESHOLD blocks) route to the
    table-driven kernel (SMEM seed tables + dynamic rolls); it must be
    bit-exact vs the jnp path."""
    from myldpccppapi_tpu.codes.nr import nr_code, triangular_encode_numpy
    from myldpccppapi_tpu.ops import pallas_bp
    from myldpccppapi_tpu.ops.bp import decode_qc

    code = nr_code(z=16, bg=1)  # z small enough to fit the 12 MB VMEM budget
    assert code.num_blocks > pallas_bp._DYN_BLOCK_THRESHOLD
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(8, code.k), dtype=np.uint8)
    c = triangular_encode_numpy(code, u)
    sigma = 10 ** (-6.0 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(0, sigma, c.shape).astype(
        np.float32
    )
    llr = jnp.asarray(2.0 * y / sigma**2).at[:, : code.punctured_front].set(0.0)
    cfg = DecoderConfig(schedule="layered", normalization=0.8, max_iters=30)
    ref = decode_qc(code, cfg, llr)
    res = pallas_bp.decode_qc_pallas(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    assert (np.asarray(res.iterations) == np.asarray(ref.iterations)).all()
    assert (np.asarray(res.bits)[:, : code.k] == u).all()


def test_choose_batch_tile_scales_down():
    small = wimax(576, "1/2")
    assert choose_batch_tile(small) == 128
    # a synthetic huge code must get a reduced lane tile
    import dataclasses

    big = wimax(2304, "1/2")
    assert choose_batch_tile(big, vmem_budget=2 * 1024 * 1024) < 128


def _staircase_qc(z=360, q=8, kb=12, seed=7):
    """QC code with a p0 column + dual-diagonal staircase parity (the
    802.16e-style layout the removed dvbs2_qc used): layers of unequal
    degree exercise the streaming kernel's pad-slot handling."""
    from myldpccppapi_tpu.codes.qc import QCCode

    rng = np.random.default_rng(seed)
    base = np.full((q, kb + q), -1, dtype=np.int32)
    for g in range(kb):
        deg = 8 if g < kb // 3 else 3
        for l in rng.choice(q, size=deg, replace=False):
            base[l, g] = int(rng.integers(0, z))
    base[0, kb] = 1
    base[q // 2, kb] = 0
    base[q - 1, kb] = 1
    for j in range(q - 1):
        base[j, kb + 1 + j] = 0
        base[j + 1, kb + 1 + j] = 0
    return QCCode(name=f"staircase_z{z}_q{q}", base=base, z=z)


@pytest.mark.slow
def test_streaming_kernel_matches_jnp():
    """HBM-streaming fused kernel (opt-in, for codes beyond VMEM): bit-exact
    vs the jnp path including iteration counts, on a code with pad-slot
    column collisions (staircase parity, unequal layer degrees)."""
    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops.bp import decode_qc
    from myldpccppapi_tpu.ops.pallas_stream import decode_qc_stream

    code = _staircase_qc()
    rng = np.random.default_rng(0)
    enc = Encoder(code)
    u = rng.integers(0, 2, size=(4, code.k_info), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    sigma = 10 ** (-2.5 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(0, sigma, c.shape).astype(
        np.float32
    )
    llr = jnp.asarray(2.0 * y / sigma**2)
    cfg = DecoderConfig(schedule="layered", normalization=0.8, max_iters=30)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_stream(code, cfg, llr, True)
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    assert (np.asarray(res.iterations) == np.asarray(ref.iterations)).all()
    assert (np.asarray(res.converged) == np.asarray(ref.converged)).all()


def test_stream_supported_rejects_masked_and_multiedge():
    """The streaming kernel has no mask channel and no multi-edge
    writeback; it must refuse the EN 302 307 structure rather than decode
    a different H (auto dispatch gives those codes the z-lane kernel)."""
    from myldpccppapi_tpu.codes.dvbs2 import dvbs2
    from myldpccppapi_tpu.ops.pallas_stream import stream_supported
    from myldpccppapi_tpu.utils.config import DecoderConfig

    cfg = DecoderConfig(schedule="layered")
    assert stream_supported(_staircase_qc(), cfg)       # plain QC: fine
    assert not stream_supported(dvbs2(16200, "1/2"), cfg)


def test_stream_safe_table_brute_force():
    """The double-buffer prefetch table must mark a slot safe only when its
    column is a pad or is NOT written back by the previous layer (the RAW
    hazard through the HBM posterior workspace)."""
    from myldpccppapi_tpu.codes.wimax import wimax
    from myldpccppapi_tpu.ops.pallas_stream import _safe_table, _tables

    for code in [wimax(1152, "1/2"), _staircase_qc(z=96)]:
        col_tab, _, dmax = _tables(code)
        safe = _safe_table(col_tab, code.n_b)
        m_b = col_tab.shape[0]
        assert (safe[m_b - 1] == 0).all()  # never prefetch across the sweep
        for i in range(m_b - 1):
            cols_i = {int(c) for c in col_tab[i] if c < code.n_b}
            for d in range(dmax):
                j = int(col_tab[i + 1, d])
                expect = 1 if (j >= code.n_b or j not in cols_i) else 0
                assert safe[i, d] == expect, (i, d, j)
        # the table must be non-trivial (some prefetch happens) on real codes
        assert safe[: m_b - 1].sum() > 0


@pytest.mark.slow
def test_streaming_kernel_lazy_mode():
    """Lazy syndrome mode (interpret): identical converged set and
    converged-frame bits vs the exact-mode/jnp trajectory; converged =>
    valid codeword (done is latched only by the exact pass)."""
    import scipy.sparse as sp

    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops.bp import decode_qc
    from myldpccppapi_tpu.ops.pallas_stream import decode_qc_stream

    code = _staircase_qc()
    rng = np.random.default_rng(1)
    enc = Encoder(code)
    u = rng.integers(0, 2, size=(4, code.k_info), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    sigma = 10 ** (-2.3 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(
        0, sigma, c.shape
    ).astype(np.float32)
    llr = jnp.asarray(2.0 * y / sigma**2)
    ref = decode_qc(
        code, DecoderConfig(schedule="layered", normalization=0.8,
                            max_iters=30), llr
    )
    res = decode_qc_stream(
        code,
        DecoderConfig(schedule="layered", normalization=0.8, max_iters=30,
                      syndrome_mode="lazy"),
        llr, True,
    )
    conv = np.asarray(res.converged)
    assert (conv == np.asarray(ref.converged)).all()
    assert (np.asarray(res.bits)[conv] == np.asarray(ref.bits)[conv]).all()
    rows, cols = code.h_coo()
    H = sp.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(code.m, code.n)
    ).tocsr()
    if conv.any():
        assert int(((H @ np.asarray(res.bits)[conv].T) % 2).max()) == 0


def test_streaming_kernel_single_buffer_path(monkeypatch):
    """The nbuf=1 fallback (huge layers where doubled tiles exceed VMEM)
    must stay bit-exact: its r-writeback wait runs per layer (a missing
    wait here once raced dma_r_in against the previous layer's store)."""
    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops import pallas_stream
    from myldpccppapi_tpu.ops.bp import decode_qc

    monkeypatch.setattr(pallas_stream, "_pick_nbuf", lambda z, dmax: 1)
    code = _staircase_qc(z=96)
    rng = np.random.default_rng(4)
    enc = Encoder(code)
    u = rng.integers(0, 2, size=(4, code.k_info), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    sigma = 10 ** (-2.0 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(
        0, sigma, c.shape
    ).astype(np.float32)
    llr = jnp.asarray(2.0 * y / sigma**2)
    cfg = DecoderConfig(schedule="layered", normalization=0.8, max_iters=20)
    ref = decode_qc(code, cfg, llr)
    res = pallas_stream.decode_qc_stream(code, cfg, llr, True)
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(
        np.asarray(res.iterations), np.asarray(ref.iterations)
    )


@pytest.mark.parametrize("schedule", ["layered", "flooding"])
def test_pallas_soft_output_bitexact(schedule):
    """Posterior-LLR output latched in-kernel (short-code analogue of the
    z-lane soft output): bit-identical to the jnp path's per-frame latched
    posteriors at a mixed-convergence operating point, and consistent with
    the hard decisions."""
    code = wimax(576, "1/2")
    _, llr = _case(code, batch=16, snr_db=1.6, seed=7)
    cfg = DecoderConfig(schedule=schedule, normalization=0.75, max_iters=8,
                        soft_output=True)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_pallas(code, cfg, llr, True)
    conv = np.asarray(res.converged)
    assert (conv == np.asarray(ref.converged)).all()
    assert 0 < conv.sum() < 16  # the latch (not just final state) in play
    assert res.posteriors is not None
    assert res.posteriors.shape == (16, code.n)
    p, pr = np.asarray(res.posteriors), np.asarray(ref.posteriors)
    assert (p[conv] == pr[conv]).all()
    assert ((p <= 0) == np.asarray(res.bits)).all()


def test_soft_output_dispatch_refusals():
    """Dyn kernel refuses soft; streaming refuses soft; Decoder facade on
    CPU routes soft to jnp and still produces posteriors."""
    from myldpccppapi_tpu import Decoder
    from myldpccppapi_tpu.codes.nr import nr_code

    code = nr_code(z=64, bg=1)  # 316 blocks: dyn territory
    cfg = DecoderConfig(schedule="layered", max_iters=4, soft_output=True)
    with pytest.raises(ValueError, match="table-driven"):
        decode_qc_pallas(code, cfg, jnp.ones((8, code.n)), True)
    dec = Decoder(wimax(576, "1/2"), cfg)
    res = dec(jnp.ones((4, 576)))
    assert res.posteriors is not None and res.posteriors.shape == (4, 576)
