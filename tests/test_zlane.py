"""z-on-lanes fused kernel parity vs the jnp path (interpret mode on CPU).

Covers the three structural regimes the kernel must handle:
* z an exact lane multiple (5G NR z=384 -> zp == z, single-roll alignment),
* z padded to the next lane multiple (DVB-S2 z=360 -> zp=384, two-roll +
  lane-select alignment with pad lanes masked),
* multi-edge blocks and row-masked partial circulants (the EN 302 307
  accumulator structure).
On TPU the same kernel compiles natively; tests/test_zlane hardware parity
is exercised by benchmarks/run_baseline.py configs 3 and 4.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myldpccppapi_tpu import DecoderConfig
from myldpccppapi_tpu.codes.qc import QCCode
from myldpccppapi_tpu.ops.bp import decode_qc
from myldpccppapi_tpu.ops.pallas_zlane import (
    decode_qc_zlane,
    zlane_supported,
)


def _random_qc(z, m_b=4, n_b=9, seed=7, extra=False, masked=False):
    """Small QC code with a staircase parity part (full-rank enough for BP
    message-passing parity tests; we decode random LLRs, not codewords)."""
    rng = np.random.default_rng(seed)
    k_b = n_b - m_b
    base = np.full((m_b, n_b), -1, dtype=np.int32)
    for i in range(m_b):
        cols = rng.choice(k_b, size=3, replace=False)
        for j in cols:
            base[i, j] = int(rng.integers(0, z))
        base[i, k_b + i] = 0
        if i + 1 < m_b:
            base[i + 1, k_b + i] = int(rng.integers(0, z))
    extra_blocks = None
    masked_rows = None
    if extra:
        # a second circulant inside an existing base cell (multi-edge block)
        i, j = 1, int(np.nonzero(base[1][:k_b] >= 0)[0][0])
        s2 = (int(base[i, j]) + 5) % z
        extra_blocks = ((i, j, s2),)
    if masked:
        # a partial circulant: the DVB-S2 wrap-block shape (one row short)
        i, j, s = 0, k_b + m_b - 1, z - 1
        base[i, j] = s
        masked_rows = (((i, j, s), (0,)),)
    return QCCode(
        name=f"test_z{z}",
        base=base,
        z=z,
        extra_blocks=extra_blocks,
        masked_rows=masked_rows,
    )


def _llr(code, batch, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0.8, 2.0, (batch, code.n)).astype(np.float32))


def _assert_same(res, ref):
    assert (np.asarray(res.bits) == np.asarray(ref.bits)).all()
    assert (np.asarray(res.iterations) == np.asarray(ref.iterations)).all()
    assert (np.asarray(res.converged) == np.asarray(ref.converged)).all()


@pytest.mark.parametrize("z", [128, 150])
def test_zlane_matches_jnp_bitexact(z):
    """Exact-lane-multiple z and padded z, plain and normalized min-sum."""
    code = _random_qc(z)
    cfg = DecoderConfig(schedule="layered", normalization=0.75, max_iters=12)
    assert zlane_supported(code, cfg)
    llr = _llr(code, batch=16)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    _assert_same(res, ref)


def test_zlane_batch_padding():
    code = _random_qc(128)
    cfg = DecoderConfig(schedule="layered", max_iters=10)
    llr = _llr(code, batch=5, seed=3)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    _assert_same(res, ref)


def test_zlane_multi_edge_and_masked_blocks():
    """Multi-edge base cells + row-masked partial circulants (the DVB-S2
    accumulator structure) must decode bit-identically to the jnp path."""
    code = _random_qc(150, extra=True, masked=True)
    assert code.num_blocks == np.count_nonzero(code.base >= 0) + 1
    assert code.num_edges == code.num_blocks * code.z - 1
    cfg = DecoderConfig(schedule="layered", normalization=0.8, max_iters=12)
    llr = _llr(code, batch=8, seed=5)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    _assert_same(res, ref)


def test_zlane_sum_product():
    code = _random_qc(128)
    cfg = DecoderConfig(
        schedule="layered", algorithm="sum-product", max_iters=8
    )
    llr = _llr(code, batch=8, seed=2)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    _assert_same(res, ref)


def test_zlane_supported_gates():
    cfg = DecoderConfig(schedule="layered")
    assert not zlane_supported(_random_qc(32), cfg)  # lane waste
    assert not zlane_supported(
        _random_qc(128), DecoderConfig(schedule="flooding")
    )
    # real targets fit
    from myldpccppapi_tpu.codes.dvbs2 import dvbs2
    from myldpccppapi_tpu.codes.nr import nr_code

    assert zlane_supported(dvbs2(64800, "1/2"), cfg)
    assert zlane_supported(nr_code(z=384, bg=1), cfg)


def test_zlane_early_exit_latching():
    """A converged codeword's bits/iterations latch while stragglers keep
    iterating - and its syndrome stays satisfied (freeze semantics)."""
    code = _random_qc(128, seed=11)
    cfg = DecoderConfig(schedule="layered", max_iters=15)
    llr = _llr(code, batch=8, seed=9)
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    _assert_same(res, ref)
    conv = np.asarray(res.converged)
    if conv.any():
        syn = code.syndrome(np.asarray(res.bits)[conv])
        assert not syn.any()


@pytest.mark.slow
def test_zlane_lazy_syndrome():
    """Lazy syndrome mode: the exact pass runs only when the on-the-fly
    pre-check fires, so iteration counts may trail "exact" by one sweep —
    but done is still latched only by the exact syndrome, so converged
    frames must hold valid codewords, and at a benign operating point both
    modes must converge every frame to the same (true) codeword."""
    from myldpccppapi_tpu.codes.dvbs2 import dvbs2_ira_qc, ira_encode_numpy

    code = dvbs2_ira_qc(16200, "8/9")
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, size=(8, code.k), dtype=np.uint8)
    c = ira_encode_numpy(code, u)
    sigma = 10 ** (-6.5 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(
        0, sigma, c.shape
    ).astype(np.float32)
    llr = jnp.asarray(2.0 * y / sigma**2)
    base = DecoderConfig(schedule="layered", normalization=0.85, max_iters=25)
    import dataclasses

    res_e = decode_qc_zlane(code, base, llr, True)
    res_l = decode_qc_zlane(
        code, dataclasses.replace(base, syndrome_mode="lazy"), llr, True
    )
    for r in (res_e, res_l):
        assert np.asarray(r.converged).all()
        assert (np.asarray(r.bits)[:, : code.k] == u).all()
        assert not code.syndrome(np.asarray(r.bits)).any()
    # detection may only trail the exact mode, never lead it
    assert (
        np.asarray(res_l.iterations) >= np.asarray(res_e.iterations)
    ).all()


@pytest.mark.slow
def test_zlane_bf16_semantics():
    """bf16 message storage (16-codeword sublane tile).

    bf16 is NOT bit-exact across differently-structured programs (XLA may
    keep f32 intermediates inside fusions, so rounding points differ), so
    the contract is semantic: every frame converges at this operating
    point, converged frames decode to the true codeword in both paths, and
    the conv flag is consistent with the syndrome.
    """
    from myldpccppapi_tpu.codes.dvbs2 import dvbs2_ira_qc, ira_encode_numpy

    code = dvbs2_ira_qc(16200, "8/9")
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, size=(16, code.k), dtype=np.uint8)
    c = ira_encode_numpy(code, u)
    sigma = 10 ** (-6.5 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(
        0, sigma, c.shape
    ).astype(np.float32)
    llr = jnp.asarray(2.0 * y / sigma**2)
    cfg = DecoderConfig(schedule="layered", normalization=0.8,
                        max_iters=25, msg_dtype="bfloat16")
    ref = decode_qc(code, cfg, llr)
    res = decode_qc_zlane(code, cfg, llr, True)
    for r in (ref, res):
        assert np.asarray(r.converged).all()
        assert (np.asarray(r.bits)[:, : code.k] == u).all()


def test_zlane_soft_output_bitexact():
    """Posterior-LLR output latched in-kernel (VERDICT r4 item 2): must be
    bit-identical to the jnp path's per-frame latched posteriors — on plain,
    padded-z, multi-edge, and masked structures, at a mixed-convergence
    point so the latch (not just the final state) is exercised."""
    for (z, extra, masked) in [(128, False, False), (150, True, True)]:
        code = _random_qc(z, extra=extra, masked=masked)
        cfg = DecoderConfig(schedule="layered", normalization=0.75,
                            max_iters=10, soft_output=True)
        assert zlane_supported(code, cfg)
        llr = _llr(code, batch=16)
        ref = decode_qc(code, cfg, llr)
        res = decode_qc_zlane(code, cfg, llr, True)
        _assert_same(res, ref)
        assert res.posteriors is not None
        assert res.posteriors.shape == (16, code.n)
        assert (np.asarray(res.posteriors) == np.asarray(ref.posteriors)).all()
        # hard decisions must be consistent with the soft output
        assert (
            (np.asarray(res.posteriors) <= 0) == np.asarray(res.bits)
        ).all()


def test_zlane_soft_output_dispatch_cpu():
    """On CPU, auto dispatch with soft_output stays on jnp (no TPU); the
    config path itself must produce posteriors through the Decoder facade."""
    from myldpccppapi_tpu import Decoder

    code = _random_qc(128)
    dec = Decoder(code, DecoderConfig(schedule="layered", max_iters=6,
                                      soft_output=True))
    res = dec(_llr(code, batch=4))
    assert res.posteriors is not None and res.posteriors.shape == (4, code.n)
