"""Headline benchmark: decoded info throughput (Mbit/s) on one TPU chip.

Config: the reference CLI's own code (802.16e n=576, k=432, rate 3/4B —
``Test.cpp:19-26``), batched layered normalized min-sum with syndrome early
exit, at a fixed SNR/seed so the measurement is deterministic.  Prints ONE
JSON line on stdout.

``vs_baseline`` is measured live against the reference's CPU golden decode
path (``Coder::decodeCPU``, ``MyLdpc.cpp:684-784``) ported to C++ and
compiled -O3 on this host (myldpccppapi_tpu/native/golden_decoder.cpp): the
reference's GPU numbers were never published (BASELINE.md) and its OpenCL
build cannot run here.  The baseline runs the reference's actual algorithm
(plain flooding min-sum, its only decoder); ours runs this framework's best
config — a system-vs-system comparison at the same operating point.  If the
native library cannot build, a cached constant is used.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# fallback only (native golden unavailable): C++ flooding min-sum baseline
# measured on this host at the operating point below.
FALLBACK_CPU_MBITS = 0.645

SNR_DB = 5.0
BATCH = 8192
BASELINE_BATCH = 256
REPEATS = 8
SEED = 0


def _make_llr(code, batch, seed):
    import jax
    import jax.numpy as jnp
    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops.channel import transmit

    enc = Encoder(code)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    llr, _ = transmit(jax.random.PRNGKey(seed), jnp.asarray(c), snr_db=SNR_DB)
    return u, np.asarray(llr, dtype=np.float32)


def cpu_baseline_mbits(code, llr) -> float:
    """Reference-algorithm C++ single-core throughput at this operating
    point (plain flooding min-sum, 40-iteration cap)."""
    from myldpccppapi_tpu import native

    sub = llr[:BASELINE_BATCH]
    out = native.decode_golden_native(code, sub, max_iters=40)
    if out is None:
        return FALLBACK_CPU_MBITS
    t0 = time.perf_counter()
    native.decode_golden_native(code, sub, max_iters=40)
    dt = time.perf_counter() - t0
    return len(sub) * code.k / dt / 1e6


def main() -> None:
    import jax
    import jax.numpy as jnp
    from myldpccppapi_tpu import Decoder, DecoderConfig, wimax

    code = wimax(576, "3/4B")
    u, llr = _make_llr(code, BATCH, SEED)
    base = cpu_baseline_mbits(code, llr)

    dec = Decoder(
        code,
        DecoderConfig(
            algorithm="min-sum",
            schedule="layered",
            normalization=0.75,
            max_iters=40,
            # two-phase straggler triage (bit-identical, see ops/triage.py):
            # without it every 128-lane tile runs to the slowest lane's cap
            triage_iters=5,
        ),
    )
    llr_dev = jax.device_put(jnp.asarray(llr))
    res = dec(llr_dev)  # compile + warm up
    jax.block_until_ready(res.bits)
    conv = np.asarray(res.converged)
    assert conv.mean() > 0.98, f"bench batch must mostly converge ({conv.mean():.3f})"
    bits = np.asarray(res.bits)
    assert (bits[conv][:, : code.k] == u[conv]).all(), "bench decode wrong"

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        res = dec(llr_dev)
    jax.block_until_ready(res.bits)
    dt = time.perf_counter() - t0

    mbits = BATCH * code.k * REPEATS / dt / 1e6
    print(
        f"[bench] impl={dec.implementation} conv={conv.mean():.4f} "
        f"iters={np.asarray(res.iterations).mean():.2f} "
        f"cpu_baseline={base:.3f} Mbit/s tpu={mbits:.1f} Mbit/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "decoded_info_throughput_n576_r34B_layered_nms_5dB",
                "value": round(mbits, 3),
                "unit": "Mbit/s/chip",
                "vs_baseline": round(mbits / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
