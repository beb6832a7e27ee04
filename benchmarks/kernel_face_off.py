"""Head-to-head of the two fused kernel layouts on one code (real TPU).

The [z, lanes] kernel (ops/pallas_bp.py) puts codewords on lanes and z on
sublanes, so every circulant alignment is a SUBLANE rotate; the z-lane
kernel (ops/pallas_zlane.py) puts z on lanes (padded to 128) and 8
codewords on sublanes, so alignments are LANE rotates.  For mid-size z
(e.g. 802.11n z=81) both fit VMEM and the better layout is an empirical
question: lane rolls are cheaper per op but the z-lane layout pads 81->128
lanes (37% waste) and its 8-codeword tile gives finer early-exit
granularity than 128 lanes.

Timing: grouped scan over G batches with scalar counters, with the host
readback of the counters INSIDE the timed region — `block_until_ready`
does not reliably block on pipelined dispatches through the tunnel
(BENCH_NOTES.md methodology note 3).

Usage: python benchmarks/kernel_face_off.py [wifi|nr]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def main():
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import DecoderConfig, Encoder, wifi
    from myldpccppapi_tpu.ops.pallas_bp import decode_qc_pallas
    from myldpccppapi_tpu.ops.pallas_zlane import decode_qc_zlane

    which = sys.argv[1] if len(sys.argv) > 1 else "wifi"
    if which == "wifi":
        code = wifi(1944, "5/6")
        snr_db, batch, group = 6.5, 4096, 8
        cfg = DecoderConfig(schedule="layered", normalization=0.75,
                            max_iters=40)
        enc = Encoder(code)
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
        cw = np.asarray(enc(jnp.asarray(u)))
    else:
        from myldpccppapi_tpu.codes.nr import nr_code, triangular_encode_fn

        code = nr_code(z=384, bg=1)
        snr_db, batch, group = 5.0, 512, 8
        cfg = DecoderConfig(schedule="layered", normalization=0.8,
                            max_iters=30)
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
        cw = np.asarray(jax.jit(triangular_encode_fn(code))(jnp.asarray(u)))

    sigma = 10 ** (-snr_db / 20)
    sym_dev = jax.device_put(jnp.asarray(1.0 - 2.0 * cw.astype(np.float32)))

    def make_run(decode):
        @jax.jit
        def run(key, sym):
            def body(carry, k):
                noise = sigma * jax.random.normal(k, sym.shape, jnp.float32)
                res = decode(2.0 * (sym + noise) / (sigma * sigma))
                it, cv = carry
                return (it + jnp.sum(res.iterations),
                        cv + jnp.sum(jnp.where(res.converged, 1, 0))), None
            zero = jnp.zeros((), jnp.int32)
            out, _ = jax.lax.scan(body, (zero, zero),
                                  jax.random.split(key, group))
            return out
        return run

    rows = []
    for name, decode in [
        ("z_sublane", functools.partial(decode_qc_pallas, code, cfg)),
        ("z_lane", functools.partial(decode_qc_zlane, code, cfg)),
    ]:
        run = make_run(decode)
        out = run(jax.random.PRNGKey(100), sym_dev)  # compile + warm
        _ = [int(x) for x in out]
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run(jax.random.PRNGKey(i), sym_dev)
            vals = [int(x) for x in out]  # forces real completion
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        frames = group * batch
        rows.append({
            "kernel": name,
            "throughput_mbits": round(frames * code.k / dt / 1e6, 3),
            "dispatch_ms": round(dt * 1e3, 3),
            "conv_rate": round(vals[1] / frames, 4),
            "mean_iters": round(vals[0] / frames, 2),
        })
        print(rows[-1], flush=True)

    rec = {"config": "face_off", "code": which, "snr_db": snr_db,
           "frames_per_dispatch": group * batch, "rows": rows}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
