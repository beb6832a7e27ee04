"""RS-LDPC (802.3an-class (2048, 1723)) decode throughput on chip.

The fused Pallas kernel serves the XOR-permutation blocks via butterfly
alignment (ops/pallas_bp._xor_align) — this measures its marginal rate at
the clean 6.5 dB operating point (conv 1.0) and a cliff point, with the
standard two-depth pipelined-dispatch fit.  Also records the edge-list
path on one batch for the speedup ratio.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from run_baseline import _depth_fit, _emit, _fit_record, _pipe_rounds

from myldpccppapi_tpu import Decoder, DecoderConfig
from myldpccppapi_tpu.codes import rs_ldpc
from myldpccppapi_tpu.codes.encoder import encode_numpy
from myldpccppapi_tpu.ops.pallas_bp import decode_qc_pallas


def main(snr_db=6.5, batch=2048, n_pipe=16):
    code = rs_ldpc()
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (batch, code.k_info), np.uint8)
    cw = encode_numpy(code.encoder_matrices, u)
    sym = jax.device_put(jnp.asarray(1.0 - 2.0 * cw.astype(np.float32)))
    u_dev = jax.device_put(jnp.asarray(u, jnp.int8))
    pos = jnp.asarray(np.asarray(code.info_positions))
    sigma = 10.0 ** (-snr_db / 20.0)
    cfg = DecoderConfig(schedule="layered", normalization=0.75, max_iters=20)

    @jax.jit
    def one(key):
        llr = 2.0 * (sym + sigma * jax.random.normal(key, sym.shape)) / (
            sigma * sigma
        )
        res = decode_qc_pallas(code, cfg, llr)
        berr = jnp.sum(
            (res.bits[:, pos].astype(jnp.int8) != u_dev).astype(jnp.int32)
        )
        return jnp.stack([jnp.sum(res.converged), jnp.sum(res.iterations),
                          berr])

    make_input = lambda i: jax.random.PRNGKey(9000 + i)
    dt, agg = _pipe_rounds(one, make_input, n_pipe)
    dt_lo, n_lo = _depth_fit(one, make_input, n_pipe)
    conv, it, berr = (int(x) for x in agg)
    frames = batch * n_pipe

    # edge-list path on one batch for the ratio (same noise family)
    dec_el = Decoder(code, cfg, implementation="edgelist")
    llr0 = 2.0 * (sym + sigma * jax.random.normal(
        jax.random.PRNGKey(1), sym.shape)) / (sigma * sigma)
    r = dec_el(llr0)
    np.asarray(r.bits)  # warm
    llr1 = 2.0 * (sym + sigma * jax.random.normal(
        jax.random.PRNGKey(2), sym.shape)) / (sigma * sigma)
    t0 = time.perf_counter()
    r = dec_el(llr1)
    np.asarray(r.bits)
    dt_el = time.perf_counter() - t0

    _emit({
        "config": "rs_ldpc", "name": f"rs_ldpc_2048_1723_{snr_db}dB",
        "throughput_mbits": round(frames * code.k_info / dt / 1e6, 3),
        "fit": _fit_record(dt, n_pipe, dt_lo, n_lo, batch * code.k_info),
        "round_ms": round(dt * 1e3, 3), "frames_per_round": frames,
        "conv": round(conv / frames, 5),
        "mean_iters": round(it / frames, 3),
        "bit_errors": berr,
        "edgelist_ms_per_batch": round(dt_el * 1e3, 1),
        "impl": "pallas (xor butterfly)",
    })


if __name__ == "__main__":
    snr = float(sys.argv[1]) if len(sys.argv) > 1 else 6.5
    main(snr_db=snr)
