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

# fallback only (native golden unavailable): C++ -O3 flooding min-sum
# baseline measured on this host at the operating point below (BENCH_NOTES
# records 1.8-2.3 Mbit/s across runs; use the midpoint so a build failure
# cannot inflate the vs_baseline ratio).
FALLBACK_CPU_MBITS = 2.05

SNR_DB = 5.0
BATCH = 8192
GROUP = 128       # independent decode dispatches pipelined per timed round:
                  # the dev tunnel has a fixed per-execute RPC overhead, and
                  # back-to-back async dispatches hide it behind compute
                  # (the sync point is one stacked-counter readback)
BASELINE_BATCH = 256
FITS = 3          # interleaved (deep, shallow) round pairs; median slope wins
SEED = 0

# Fit sanity gates (BENCH_NOTES round-4: after a remote-compile failure or a
# killed TPU process, two-depth fits go insane in BOTH directions — one run
# measured 10836 Mbit/s off a 199 ms fixed, the next 336 off a NEGATIVE
# fixed).  Healthy history for this program: slope 0.95-1.40 ms/dispatch,
# fixed 8-30 ms.  The gates only reject the insane, not the merely slow.
SLOPE_MS_RANGE = (0.2, 5.0)
FIXED_MS_RANGE = (-10.0, 250.0)
# the median is trusted when a strict majority of slopes agree with it
# (max/min spread would let ONE drifted pair poison a run whose other five
# slopes cluster within 2% — observed on this tunnel)
SLOPE_NEAR_BAND = (0.75, 1.33)
HEALTH_MS_MAX = 120.0    # tiny-matmul execute+readback, healthy ~30-45 ms
HEALTH_TRIES = 5
HEALTH_WAIT_S = 60.0


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


def _make_llr_set(code, batch, n_sets):
    """Distinct noise realizations of one codeword batch — every timed call
    must see fresh data (the tunnel's execute path caches results for
    repeated identical requests)."""
    import jax
    import jax.numpy as jnp
    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops.channel import transmit

    enc = Encoder(code)
    rng = np.random.default_rng(SEED)
    u = rng.integers(0, 2, size=(batch, code.k), dtype=np.uint8)
    c = encode_numpy(enc.mats, u)
    cj = jnp.asarray(c)
    llrs = [
        np.asarray(transmit(jax.random.PRNGKey(SEED + i), cj, snr_db=SNR_DB)[0],
                   dtype=np.float32)
        for i in range(n_sets)
    ]
    return u, llrs


def tunnel_health_probe() -> float:
    """Median execute+readback latency (ms) of a tiny matmul, retried with a
    cool-down while unhealthy.

    BENCH_NOTES (round 4) calls this probe mandatory: a wedged remote-compile
    helper or a recently killed TPU process leaves the tunnel in a state
    where throughput fits are insane in both directions.  Healthy is ~30-45
    ms on this rig; a probe above HEALTH_MS_MAX triggers an idle wait and a
    re-probe rather than a garbage headline measurement.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256), jnp.float32)
    float(tiny(x))  # compile outside the probe
    for attempt in range(HEALTH_TRIES):
        lats = []
        for i in range(5):
            t0 = time.perf_counter()
            float(tiny(x * (1.0 + 1e-6 * (attempt * 5 + i))))  # fresh input
            lats.append((time.perf_counter() - t0) * 1e3)
        med = sorted(lats)[len(lats) // 2]
        if med <= HEALTH_MS_MAX:
            return med
        print(f"[bench] tunnel unhealthy (probe {med:.0f} ms); "
              f"waiting {HEALTH_WAIT_S:.0f}s", file=sys.stderr)
        time.sleep(HEALTH_WAIT_S)
    return med


def cpu_baseline_mbits(code, llr) -> float:
    """Reference-algorithm C++ single-core throughput at this operating
    point (plain flooding min-sum, 40-iteration cap)."""
    from myldpccppapi_tpu import native

    sub = llr[:BASELINE_BATCH]
    out = native.decode_golden_native(code, sub, max_iters=40)
    if out is None:
        return FALLBACK_CPU_MBITS
    # best of two timed runs: the least-contended run is the fairest to
    # the baseline, and keeps vs_baseline conservative when background
    # load depresses one measurement
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        native.decode_golden_native(code, sub, max_iters=40)
        dt = time.perf_counter() - t0
        best = max(best, len(sub) * code.k / dt / 1e6)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    from myldpccppapi_tpu import Decoder, DecoderConfig, wimax

    code = wimax(576, "3/4B")
    _, llr_base = _make_llr(code, 256, SEED)
    base = cpu_baseline_mbits(code, llr_base)

    cfg = DecoderConfig(
        algorithm="min-sum",
        schedule="layered",
        normalization=0.75,
        max_iters=40,
        # two-phase straggler triage (bit-identical, see ops/triage.py):
        # without it every 128-lane tile runs to the slowest lane's cap
        triage_iters=5,
    )
    dec = Decoder(code, cfg)

    # Pipelined-dispatch methodology (BENCH_NOTES): per timed round, GROUP
    # independent decode dispatches over DISTINCT pre-staged noise
    # realizations are submitted back-to-back; the sync point is ONE host
    # transfer of the stacked per-dispatch counters.  block_until_ready is
    # NOT a trustworthy sync through the dev tunnel (it systematically
    # under-blocks: measured 80 ms for a dispatch whose true completion is
    # ~130 ms), so the timed region ends at a real readback.  Decoded bits
    # reduce to scalar counters on device; nothing large crosses the wire.
    from myldpccppapi_tpu.codes.encoder import Encoder, encode_numpy
    from myldpccppapi_tpu.ops.channel import transmit

    enc = Encoder(code)
    rng = np.random.default_rng(SEED)
    u_all = rng.integers(0, 2, size=(BATCH, code.k), dtype=np.uint8)
    cj = jax.device_put(jnp.asarray(encode_numpy(enc.mats, u_all)))
    u_dev = jax.device_put(jnp.asarray(u_all, jnp.int8))

    @jax.jit
    def make_llr(key, c):
        return transmit(key, c, snr_db=SNR_DB)[0]

    # Noise is staged ON DEVICE per timed round (one distinct realization
    # per dispatch — the tunnel caches repeated identical requests) and
    # freed after each round: ~2.4 GB of HBM live instead of ~9 GB for the
    # whole run staged upfront.  Measured identical slope either way
    # (0.958 vs 0.961 ms/dispatch), so this is purely a footprint fix.
    GROUP_LO = GROUP // 4

    @jax.jit
    def one(llr, u_ref):
        res = dec(llr)
        berr = jnp.sum(
            (res.bits[:, : code.k].astype(jnp.int8) != u_ref).astype(jnp.int32)
        )
        return jnp.stack(
            [berr, jnp.sum(jnp.where(res.converged, 0, 1)),
             jnp.sum(res.iterations)]
        )

    # warm round compiles decode + the counter-stack program; its input is
    # never re-timed
    w = make_llr(jax.random.PRNGKey(SEED - 1), cj)
    jax.block_until_ready(w)
    warm = np.asarray(jnp.stack([one(w, u_dev) for _ in range(8)]))
    del w

    key_counter = [1000]  # every staged realization distinct, incl. retries

    def one_round(depth):
        base_key = key_counter[0]
        key_counter[0] += depth
        devs = [make_llr(jax.random.PRNGKey(SEED + base_key + i), cj)
                for i in range(depth)]
        jax.block_until_ready(devs)
        t0 = time.perf_counter()
        outs = [one(llr, u_dev) for llr in devs]
        final = np.asarray(jnp.stack(outs))  # single transfer = sync
        dt = time.perf_counter() - t0
        del devs  # free HBM before staging the next round
        return dt, final.sum(axis=0)

    def measure_fits(n_fits):
        """Interleaved (deep, shallow) round pairs -> per-pair two-depth
        fits: round_s = fixed + slope * n_pipe.  The depth-INDEPENDENT chip
        rate is bits-per-dispatch / slope; interleaving the depths keeps
        slow tunnel drift from biasing one depth (the r03->r04 scoreboard
        regression was exactly one drifted single-fit capture)."""
        pairs = []
        for _ in range(n_fits):
            dt_hi, agg = one_round(GROUP)
            dt_lo, _ = one_round(GROUP_LO)
            slope = (dt_hi - dt_lo) / (GROUP - GROUP_LO)
            pairs.append((slope, dt_hi - slope * GROUP, dt_hi, agg))
        return pairs

    def fit_sane(slope_ms, fixed_ms, slopes_ms):
        near = sum(
            SLOPE_NEAR_BAND[0] * slope_ms <= s <= SLOPE_NEAR_BAND[1] * slope_ms
            for s in slopes_ms
        )
        return (SLOPE_MS_RANGE[0] <= slope_ms <= SLOPE_MS_RANGE[1]
                and FIXED_MS_RANGE[0] <= fixed_ms <= FIXED_MS_RANGE[1]
                and near > len(slopes_ms) // 2)

    health_ms = tunnel_health_probe()
    pairs = measure_fits(FITS)
    fit_suspect = False
    for attempt in range(2):
        slopes = sorted(p[0] for p in pairs)
        slope = slopes[len(slopes) // 2]
        med_pair = min(pairs, key=lambda p: abs(p[0] - slope))
        fixed_ms = med_pair[1] * 1e3
        if fit_sane(slope * 1e3, fixed_ms, [s * 1e3 for s in slopes]):
            break
        if attempt == 0:
            # insane fit: re-probe tunnel health (waits while unhealthy),
            # then fold in a fresh set of pairs and re-take the median
            print(f"[bench] fit failed sanity gates (slope {slope*1e3:.3f} "
                  f"ms, fixed {fixed_ms:.1f} ms, slopes "
                  f"{[round(s*1e3, 3) for s in slopes]}); "
                  "re-probing and re-measuring", file=sys.stderr)
            health_ms = tunnel_health_probe()
            pairs += measure_fits(FITS)
        else:
            fit_suspect = True  # emit anyway, loudly flagged
    marginal_mbits = BATCH * code.k / slope / 1e6

    dt = sorted(p[2] for p in pairs)[len(pairs) // 2]
    agg = np.sum([p[3] for p in pairs], axis=0)
    berr, unconv, iters_sum = (int(x) for x in agg)
    frames = len(pairs) * GROUP * BATCH
    conv_rate = 1.0 - unconv / frames
    assert conv_rate > 0.98, f"bench batch must mostly converge ({conv_rate:.3f})"
    # converged frames must decode correctly: at this SNR undetected errors
    # are essentially impossible, so every bit error comes from unconverged
    # frames (bounded by k per frame)
    assert berr <= unconv * code.k

    mbits = GROUP * BATCH * code.k / dt / 1e6
    print(
        f"[bench] impl={dec.implementation} conv={conv_rate:.4f} "
        f"iters={iters_sum/frames:.2f} frames/round={GROUP*BATCH} "
        f"pipelined_dispatches={GROUP} round_ms={dt*1e3:.1f} "
        f"health={health_ms:.0f} ms "
        f"fit(median of {len(pairs)}): fixed={fixed_ms:.1f} ms/round, "
        f"{slope*1e3:.3f} ms/dispatch "
        f"slopes={[round(s*1e3, 3) for s in slopes]} "
        f"round_rate={mbits:.1f} Mbit/s "
        f"cpu_baseline={base:.3f} Mbit/s marginal={marginal_mbits:.1f} Mbit/s"
        + (" FIT_SUSPECT" if fit_suspect else ""),
        file=sys.stderr,
    )
    record = {
        # PRIMARY metric since round 3: the depth-independent
        # marginal chip rate (the slope of the two-depth fit) —
        # invariant to pipeline depth, unlike the round rate
        "metric": "decoded_info_marginal_throughput_n576_r34B_layered_nms_5dB",
        "value": round(marginal_mbits, 3),
        "unit": "Mbit/s/chip",
        "vs_baseline": round(marginal_mbits / base, 2),
        "fit": {
            "fixed_ms": round(fixed_ms, 3),
            "per_dispatch_ms": round(slope * 1e3, 4),
            "depths": [GROUP_LO, GROUP],
            "slopes_ms": [round(s * 1e3, 4) for s in slopes],
            "health_probe_ms": round(health_ms, 1),
        },
        "round_rate_mbits": round(mbits, 3),
        "round_ms": round(dt * 1e3, 2),
    }
    if fit_suspect:
        record["fit_suspect"] = True
    print(json.dumps(record))


if __name__ == "__main__":
    main()
