"""Two-phase straggler triage must be bit-identical to single-pass decode."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from myldpccppapi_tpu import Decoder, DecoderConfig, Encoder, wimax
from myldpccppapi_tpu.codes import encode_numpy
from myldpccppapi_tpu.ops.channel import transmit


def _llr(code, batch, snr_db, seed=0):
    enc = Encoder(code)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    llr, _ = transmit(jax.random.PRNGKey(seed), jnp.asarray(c), snr_db=snr_db)
    return llr


def _assert_same(r0, r1):
    assert (np.asarray(r0.bits) == np.asarray(r1.bits)).all()
    assert (np.asarray(r0.converged) == np.asarray(r1.converged)).all()
    assert (np.asarray(r0.iterations) == np.asarray(r1.iterations)).all()


@pytest.mark.slow
def test_triage_identical_at_operating_point():
    code = wimax(576, "3/4B")
    llr = _llr(code, 64, snr_db=4.5)
    base = Decoder(code, DecoderConfig(schedule="layered", normalization=0.75))
    tri = Decoder(
        code, DecoderConfig(schedule="layered", normalization=0.75, triage_iters=4)
    )
    r0, r1 = base(llr), tri(llr)
    # the point must actually exercise the retry path: some stragglers
    assert 0 < (~np.asarray(r0.converged)).sum() <= 8  # < cap (64/8)
    _assert_same(r0, r1)


@pytest.mark.slow
def test_triage_fallback_when_over_capacity():
    """Far below threshold (>cap frames fail fast pass) the wrapper must
    fall back to the full-batch decode and still match exactly."""
    code = wimax(576, "3/4B")
    llr = _llr(code, 32, snr_db=0.5, seed=1)
    base = Decoder(code, DecoderConfig(schedule="layered"))
    tri = Decoder(code, DecoderConfig(schedule="layered", triage_iters=4))
    r0, r1 = base(llr), tri(llr)
    assert (~np.asarray(r0.converged)).sum() > 4  # over the cap of 32/8
    _assert_same(r0, r1)


def test_triage_noop_when_cap_covers_batch():
    code = wimax(576, "1/2")
    llr = _llr(code, 8, snr_db=4.0, seed=2)
    tri = Decoder(
        code,
        DecoderConfig(schedule="layered", triage_iters=4, triage_cap_frac=2.0),
    )
    base = Decoder(code, DecoderConfig(schedule="layered"))
    _assert_same(base(llr), tri(llr))
