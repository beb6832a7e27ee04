"""DVB-S2-style IRA family: structure, O(n) encoder, edge-list decode.

Full-length n=64800 runs are exercised in the benchmark; tests use the
short-frame n=16200 class and a mini profile for speed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myldpccppapi_tpu import Decoder, DecoderConfig
from myldpccppapi_tpu.codes.dvbs2 import dvbs2


@pytest.fixture(scope="module")
def code():
    return dvbs2(16200, "1/2")


def test_structure(code):
    # short-frame "1/2" has k_ldpc=7200 (EN 302 307 Table 5b convention)
    assert code.n == 16200 and code.k == 7200 and code.q == 9000 // 360
    rows, cols = code.h_coo()
    assert rows.max() < code.m and cols.max() < code.n
    # accumulator: parity column k+i in rows i and i+1
    idx = code.edge_index
    assert idx.num_layers == code.q


def test_encode_valid_codeword(code, rng):
    u = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
    c = code.encode_numpy(u)
    assert c.shape == (4, code.n)
    assert code.syndrome(c).sum() == 0
    assert (c[:, : code.k] == u).all()  # systematic


def test_jnp_encode_matches_numpy(code, rng):
    u = rng.integers(0, 2, size=(3, code.k), dtype=np.uint8)
    c_np = code.encode_numpy(u)
    c_j = np.asarray(jax.jit(code.encode_fn())(jnp.asarray(u)))
    assert (c_np == c_j).all()


def test_qc_form_valid_and_decodable(rng):
    """The z=360 QC form (block-circulant regrouping of the q-periodic
    structure): triangular encode produces valid codewords and the QC roll
    decoder recovers them."""
    from myldpccppapi_tpu.codes.dvbs2 import (
        dvbs2_qc,
        qc_ira_encode_fn,
        qc_ira_encode_numpy,
    )
    from myldpccppapi_tpu.ops.bp import decode_qc

    import jax

    code = dvbs2_qc(16200, "1/2")
    assert code.z == 360 and code.k == 7200
    # every parity column must have degree >= 2 (no error floor)
    deg = np.count_nonzero(code.base >= 0, axis=0)
    assert (deg[code.k // 360 :] >= 2).all()
    u = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
    c = qc_ira_encode_numpy(code, u)
    assert code.syndrome(c).sum() == 0
    c_j = np.asarray(jax.jit(qc_ira_encode_fn(code))(jnp.asarray(u)))
    assert (c == c_j).all()
    sigma = 10 ** (-2.5 / 20)
    y = (1.0 - 2.0 * c.astype(np.float32)) + rng.normal(0, sigma, c.shape).astype(
        np.float32
    )
    llr = jnp.asarray(2.0 * y / sigma**2)
    res = decode_qc(
        code,
        DecoderConfig(schedule="layered", normalization=0.8, max_iters=50),
        llr,
    )
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.bits)[:, : code.k] == u).all()


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_decode_end_to_end(code, rng, schedule):
    u = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
    c = code.encode_numpy(u)
    snr_db = 3.0
    sigma = 10 ** (-snr_db / 20)
    noise = np.random.default_rng(1).normal(0, sigma, (4, code.n)).astype(np.float32)
    y = (1.0 - 2.0 * c.astype(np.float32)) + noise
    llr = 2.0 * y / sigma**2
    dec = Decoder(
        code, DecoderConfig(schedule=schedule, normalization=0.8, max_iters=50)
    )
    assert dec.implementation == "edgelist"
    res = dec(jnp.asarray(llr))
    assert np.asarray(res.converged).all()
    assert (np.asarray(dec.info_bits(res)) == u).all()
