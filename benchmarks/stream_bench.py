"""Streaming-kernel tier benchmark: a plain-QC code beyond the z-lane
VMEM ceiling (n=153,600, z=512, ~767k edges — the "stream_giant" shape).

Measures the streaming kernel under the standard two-depth-fit pipelined
methodology (see run_baseline._pipe_rounds) at a clean operating point, so
kernel revisions (double-buffered DMA, lazy syndrome) have an
apples-to-apples record in results.jsonl.

Usage::

    python benchmarks/stream_bench.py [label] [--lazy] [--impl pallas_stream]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_baseline import _depth_fit, _emit, _fit_record, _pipe_rounds  # noqa: E402


def giant_code(z=512, m_b=150, n_b=300, seed=11):
    """Synthetic plain single-circulant QC code, ~767k edges: info columns
    of degree 5 + a dual-diagonal staircase parity part."""
    from myldpccppapi_tpu.codes.qc import QCCode

    rng = np.random.default_rng(seed)
    kb = n_b - m_b
    base = np.full((m_b, n_b), -1, dtype=np.int32)
    for g in range(kb):
        for l in rng.choice(m_b, size=5, replace=False):
            base[l, g] = int(rng.integers(0, z))
    base[0, kb] = 1
    base[m_b // 2, kb] = 0
    base[m_b - 1, kb] = 1
    for j in range(m_b - 1):
        base[j, kb + 1 + j] = 0
        base[j + 1, kb + 1 + j] = 0
    return QCCode(name=f"giant_qc_z{z}_{n_b}x{m_b}", base=base, z=z)


def main():
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import Decoder, DecoderConfig

    args = sys.argv[1:]
    label = args[0] if args and not args[0].startswith("-") else "stream_giant2"
    lazy = "--lazy" in args
    impl = "pallas_stream"
    for pos, a in enumerate(args):
        if a.startswith("--impl="):
            impl = a.split("=", 1)[1]
        elif a == "--impl" and pos + 1 < len(args):
            impl = args[pos + 1]
    batch, n_pipe, snr_db = 256, 8, 2.6

    code = giant_code()
    # all-zeros codeword (valid for any linear code): the RU encoder
    # precompute on a 76800x153600 H would dominate the bench setup
    sigma = 10 ** (-snr_db / 20)
    sym_dev = jax.device_put(jnp.ones((batch, code.n), jnp.float32))
    u_dev = jax.device_put(jnp.zeros((batch, code.k_info), jnp.int8))
    pos = jnp.asarray(code.info_positions)

    cfg = DecoderConfig(
        schedule="layered", normalization=0.8, max_iters=30,
        implementation=impl,
        syndrome_mode="lazy" if lazy else "exact",
    )
    dec = Decoder(code, cfg)

    @jax.jit
    def make_llr(key):
        noise = sigma * jax.random.normal(key, sym_dev.shape, jnp.float32)
        return 2.0 * (sym_dev + noise) / (sigma * sigma)

    @jax.jit
    def one(llr, u_ref):
        res = dec(llr)
        berr = jnp.sum(
            (res.bits[:, pos].astype(jnp.int8) != u_ref).astype(jnp.int32)
        )
        return jnp.stack([jnp.sum(res.iterations),
                          jnp.sum(jnp.where(res.converged, 1, 0)), berr])

    one_fn = lambda llr: one(llr, u_dev)
    make_input = lambda i: make_llr(jax.random.PRNGKey(2000 + i))
    dt, agg = _pipe_rounds(one_fn, make_input, n_pipe)
    dt_lo, n_lo = _depth_fit(one_fn, make_input, n_pipe)
    frames = n_pipe * batch
    iters_sum, conv_sum, berr = (int(x) for x in agg)
    _emit({
        "config": label,
        "impl": dec.implementation,
        "n": code.n, "z": code.z,
        "syndrome_mode": cfg.syndrome_mode,
        "snr_db": snr_db,
        "round_ms": round(dt * 1e3, 1),
        "fit": _fit_record(dt, n_pipe, dt_lo, n_lo, batch * code.k_info),
        "conv_rate": round(conv_sum / frames, 4),
        "mean_iters": round(iters_sum / frames, 2),
        "bit_errors": berr,
    })


if __name__ == "__main__":
    main()
