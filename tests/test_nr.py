"""5G-NR-style family: triangular encode, puncturing, rate matching, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myldpccppapi_tpu import Decoder, DecoderConfig
from myldpccppapi_tpu.codes.nr import (
    nr_code,
    rate_match_bits,
    rate_match_llr,
    triangular_encode_fn,
    triangular_encode_numpy,
)


@pytest.fixture(scope="module")
def code():
    return nr_code(z=32, bg=1)  # small lifting for CPU tests


def test_shapes(code):
    assert code.n == 68 * 32 and code.k == 22 * 32
    assert code.punctured_front == 2 * 32


def test_triangular_encode_valid_codeword(code, rng):
    u = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
    c = triangular_encode_numpy(code, u)
    assert c.shape == (4, code.n)
    assert code.syndrome(c).sum() == 0


def test_jnp_encode_matches_numpy(code, rng):
    u = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
    c_np = triangular_encode_numpy(code, u)
    c_j = np.asarray(triangular_encode_fn(code)(jnp.asarray(u)))
    assert (c_np == c_j).all()


def test_rate_match_roundtrip(code, rng):
    """bits -> rate-matched -> LLR de-rate-match must place soft values at
    the right codeword positions (0 where never sent)."""
    u = rng.integers(0, 2, size=(2, code.k), dtype=np.uint8)
    c = triangular_encode_numpy(code, u)
    e = code.n - code.punctured_front + 100  # wrap 100 bits (soft combining)
    tx = np.asarray(rate_match_bits(code, jnp.asarray(c), e))
    assert tx.shape == (2, e)
    llr_e = 1.0 - 2.0 * tx.astype(np.float32)  # perfect channel
    llr = np.asarray(rate_match_llr(code, jnp.asarray(llr_e), e))
    assert llr.shape == (2, code.n)
    # punctured front: no information
    assert (llr[:, : code.punctured_front] == 0).all()
    # transmitted-once positions carry +-1, wrapped positions +-2
    body = llr[:, code.punctured_front :]
    assert ((np.abs(body) == 1) | (np.abs(body) == 2)).all()
    signs_ok = (1.0 - 2.0 * c[:, code.punctured_front :]) * body >= 0
    assert signs_ok.all()


def test_rate_match_shortened(code, rng):
    """e smaller than the circular buffer: tail bits never sent get LLR 0."""
    u = rng.integers(0, 2, size=(2, code.k), dtype=np.uint8)
    c = triangular_encode_numpy(code, u)
    e = (code.n - code.punctured_front) - 200
    tx = np.asarray(rate_match_bits(code, jnp.asarray(c), e))
    llr_e = 1.0 - 2.0 * tx.astype(np.float32)
    llr = np.asarray(rate_match_llr(code, jnp.asarray(llr_e), e))
    assert (llr[:, : code.punctured_front] == 0).all()
    assert (llr[:, code.punctured_front + e :] == 0).all()  # untransmitted tail
    sent = llr[:, code.punctured_front : code.punctured_front + e]
    assert (np.abs(sent) == 1).all()


def test_bg2_structure_and_encode(rng):
    code2 = nr_code(z=16, bg=2)
    assert code2.n == 52 * 16 and code2.k == 10 * 16
    u = rng.integers(0, 2, size=(3, code2.k), dtype=np.uint8)
    c = triangular_encode_numpy(code2, u)
    assert code2.syndrome(c).sum() == 0


def test_nr_end_to_end_decode(code, rng):
    """Full config-4 pipeline: encode -> rate match -> AWGN -> de-rate-match
    -> BP decode recovers the info bits (punctured bits included)."""
    u = rng.integers(0, 2, size=(8, code.k), dtype=np.uint8)
    c = triangular_encode_numpy(code, u)
    e = code.n - code.punctured_front
    tx = np.asarray(rate_match_bits(code, jnp.asarray(c), e)).astype(np.float32)
    snr_db = 6.0
    sigma = 10 ** (-snr_db / 20)
    noise = np.random.default_rng(0).normal(0, sigma, tx.shape).astype(np.float32)
    y = (1.0 - 2.0 * tx) + noise
    llr_e = 2.0 * y / sigma**2
    llr = rate_match_llr(code, jnp.asarray(llr_e), e)
    dec = Decoder(code, DecoderConfig(schedule="layered", normalization=0.8, max_iters=50))
    res = dec(llr)
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.bits)[:, : code.k] == u).all()
