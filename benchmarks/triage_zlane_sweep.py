"""Straggler-triage sweep for the z-lane fused kernel (VERDICT r2 weak #4).

The z-lane kernel's early exit is per 8-codeword sublane tile
(ops/pallas_zlane.py), so a tile runs to its slowest member; config 3
(DVB-S2 64800 r1/2 @1.2-1.4 dB, 15-27 mean iterations) has the widest
iteration spread of the BASELINE grid yet ran WITHOUT triage — the round-2
triage sweep covered only the short-code kernels.  This measures
(triage_iters x cap_frac) at config 3's and config 3s's operating points
with the corrected pipelined-dispatch + readback-sync methodology
(BENCH_NOTES "Round-2 methodology revision") so the default is data-driven.

Usage::

    python benchmarks/triage_zlane_sweep.py          # both frame sizes
    python benchmarks/triage_zlane_sweep.py 64800    # one frame size
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.run_baseline import _pipe_rounds  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def sweep(n, batch, snrs, n_pipe, settings):
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import Decoder, DecoderConfig
    from myldpccppapi_tpu.codes.dvbs2 import dvbs2, ira_encode_numpy

    code = dvbs2(n, "1/2")
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    cw = ira_encode_numpy(code, u)
    sym_dev = jax.device_put(jnp.asarray(1.0 - 2.0 * cw.astype(np.float32)))
    base_cfg = DecoderConfig(schedule="layered", normalization=0.85,
                             max_iters=30, syndrome_mode="lazy")
    rows = []
    for snr_db in snrs:
        sigma = 10 ** (-snr_db / 20)

        @jax.jit
        def make_llr(key):
            noise = sigma * jax.random.normal(key, sym_dev.shape, jnp.float32)
            return 2.0 * (sym_dev + noise) / (sigma * sigma)

        for (ti, cap) in settings:
            cfg = dataclasses.replace(base_cfg, triage_iters=ti,
                                      triage_cap_frac=cap)
            dec = Decoder(code, cfg)

            @jax.jit
            def one(llr):
                res = dec(llr)
                return jnp.stack([jnp.sum(res.iterations),
                                  jnp.sum(jnp.where(res.converged, 1, 0))])

            # distinct keys per (snr, setting) so no timed dispatch repeats
            # an earlier request (tunnel result cache)
            off = int(snr_db * 100) * 10_000 + ti * 100 + int(cap * 64)
            dt, agg = _pipe_rounds(
                one, lambda i: make_llr(jax.random.PRNGKey(off + i)), n_pipe
            )
            frames = n_pipe * batch
            iters_sum, conv_sum = (int(x) for x in agg)
            row = {
                "code": code.name, "snr_db": snr_db,
                "triage_iters": ti, "cap_frac": cap,
                "impl": dec.implementation,
                "throughput_mbits": round(frames * code.k / dt / 1e6, 1),
                "round_ms": round(dt * 1e3, 2),
                "conv_rate": round(conv_sum / frames, 4),
                "mean_iters": round(iters_sum / frames, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    wanted = sys.argv[1:] or ["64800", "16200"]
    settings = [(0, 0.125), (5, 0.125), (8, 0.125), (12, 0.125), (8, 0.25)]
    rows = []
    if "64800" in wanted:
        rows += sweep(64800, batch=1024, snrs=[1.2, 1.4], n_pipe=8,
                      settings=settings)
    if "16200" in wanted:
        rows += sweep(16200, batch=4096, snrs=[1.75, 2.0], n_pipe=8,
                      settings=settings)
    with open(RESULTS, "a") as f:
        f.write(json.dumps({"config": "triage_zlane_sweep", "rows": rows})
                + "\n")


if __name__ == "__main__":
    main()
