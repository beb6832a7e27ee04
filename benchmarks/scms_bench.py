"""Self-corrected min-sum (SCMS, Savin 2008) measured on chip.

Same fixed-budget FER harness as the learned-NMS experiments
(BENCH_NOTES round 4): wimax 576 r1/2 at a 10-iteration budget, paired
noise batches, plain min-sum vs SCMS vs tuned NMS(0.75).  SCMS's pitch
is NMS-class error correction WITHOUT a tuned constant — the erasure
rule adapts per message.

Since round 5 SCMS ALSO runs on the fused flooding kernel at zero extra
VMEM (the message scratch stores sent Q instead of R — ops/pallas_bp.py),
so it is a production-rate tier, not just a quality one.
``--throughput`` measures it with the standard two-depth-fit methodology:
fused SCMS vs fused plain MS vs fused NMS(0.75) vs jnp SCMS (config
"scms_tput" in results.jsonl).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_baseline import _emit


def main():
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import Decoder, DecoderConfig, Encoder, wimax
    from myldpccppapi_tpu.codes import encode_numpy
    from myldpccppapi_tpu.ops.channel import transmit

    code = wimax(576, "1/2")
    enc = Encoder(code)
    rng = np.random.default_rng(0)
    batch, rounds, budget = 8192, 8, 10
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    cw = jnp.asarray(encode_numpy(enc.mats, u))
    u_dev = jnp.asarray(u, jnp.int8)
    pos = jnp.asarray(code.info_positions)

    variants = {
        "ms": DecoderConfig(algorithm="min-sum", schedule="flooding",
                            max_iters=budget),
        "scms": DecoderConfig(algorithm="min-sum", schedule="flooding",
                              max_iters=budget, self_correction=True),
        "nms075": DecoderConfig(algorithm="min-sum", schedule="flooding",
                                max_iters=budget, normalization=0.75),
    }
    decs = {k: Decoder(code, v) for k, v in variants.items()}

    rows = []
    for snr_db in (2.0, 2.5, 3.0):
        @jax.jit
        def make_llr(key, s=snr_db):
            return transmit(key, cw, snr_db=s)[0]

        counters = {}
        for k, d in decs.items():
            @jax.jit
            def one(llr, d=d):
                res = d(llr)
                ferr = (res.bits[:, pos].astype(jnp.int8) != u_dev
                        ).any(axis=1)
                return jnp.stack([jnp.sum(jnp.where(ferr, 1, 0)),
                                  jnp.sum(jnp.where(res.converged, 1, 0))])
            counters[k] = one

        agg = {k: np.zeros(2, np.int64) for k in decs}
        for r in range(rounds):
            llr = make_llr(jax.random.PRNGKey(9000 + 100 * int(snr_db * 10)
                                              + r))
            jax.block_until_ready(llr)
            outs = np.asarray(jnp.stack([counters[k](llr) for k in decs]))
            for i, k in enumerate(decs):
                agg[k] += outs[i].astype(np.int64)
        frames = rounds * batch
        row = {"snr_db": snr_db, "frames": frames}
        for k in decs:
            fe, cv = (int(x) for x in agg[k])
            row[k] = {"fer": round(fe / frames, 6), "frame_errors": fe,
                      "conv": round(cv / frames, 4)}
        rows.append(row)
        print(f"[scms] @{snr_db}: " + " ".join(
            f"{k}={row[k]['fer']:.2e}" for k in decs),
            file=sys.stderr, flush=True)
    _emit({"config": "scms", "name": "scms_vs_ms_nms_wimax576_r12_b10",
           "budget_iters": budget, "sweep": rows})


def throughput():
    """Two-depth-fit decode rates for the SCMS kernel tier (run on TPU)."""
    import jax
    import jax.numpy as jnp

    from run_baseline import _depth_fit, _fit_record, _pipe_rounds
    from myldpccppapi_tpu import Decoder, DecoderConfig, Encoder, wimax
    from myldpccppapi_tpu.codes import encode_numpy
    from myldpccppapi_tpu.ops.channel import transmit

    code = wimax(576, "1/2")
    enc = Encoder(code)
    rng = np.random.default_rng(0)
    batch, budget, snr_db = 8192, 10, 2.5
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    cw = jnp.asarray(encode_numpy(enc.mats, u))

    @jax.jit
    def make_llr(i):
        return transmit(jax.random.PRNGKey(7_000_000 + i), cw,
                        snr_db=snr_db)[0]

    variants = {
        "scms_pallas": DecoderConfig(
            algorithm="min-sum", schedule="flooding", max_iters=budget,
            self_correction=True, implementation="pallas"),
        "ms_pallas": DecoderConfig(
            algorithm="min-sum", schedule="flooding", max_iters=budget,
            implementation="pallas"),
        "nms075_pallas": DecoderConfig(
            algorithm="min-sum", schedule="flooding", max_iters=budget,
            normalization=0.75, implementation="pallas"),
        "scms_jnp": DecoderConfig(
            algorithm="min-sum", schedule="flooding", max_iters=budget,
            self_correction=True, implementation="jnp"),
    }
    bits_per_dispatch = batch * code.k
    row = {"config": "scms_tput",
           "name": "scms_kernel_rate_wimax576_r12_b10_2p5dB",
           "batch": batch, "budget_iters": budget, "snr_db": snr_db}
    for name, cfg in variants.items():
        dec = Decoder(code, cfg)

        @jax.jit
        def one(llr, d=dec):
            res = d(llr)
            return jnp.stack([jnp.sum(res.iterations),
                              jnp.sum(jnp.where(res.converged, 1, 0))])

        n_pipe = 8 if name == "scms_jnp" else 32
        dt_hi, agg = _pipe_rounds(one, make_llr, n_pipe)
        dt_lo, n_lo = _depth_fit(one, make_llr, n_pipe)
        fit = _fit_record(dt_hi, n_pipe, dt_lo, n_lo, bits_per_dispatch)
        fit["conv"] = round(float(agg[1]) / (n_pipe * batch), 4)
        fit["iters_mean"] = round(float(agg[0]) / (n_pipe * batch), 2)
        row[name] = fit
        print(f"[scms_tput] {name}: {fit['marginal_mbits']} Mbit/s "
              f"({fit['per_dispatch_ms']} ms/dispatch, conv {fit['conv']})",
              file=sys.stderr, flush=True)
    _emit(row)


if __name__ == "__main__":
    if "--throughput" in sys.argv:
        throughput()
    else:
        main()
