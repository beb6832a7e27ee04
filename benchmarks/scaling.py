"""Weak-scaling efficiency of the sharded decode pipeline.

BASELINE.json's third headline metric is N-host scaling efficiency >= 85%.
This harness measures weak scaling of the sharded simulation step (fixed
per-device batch, growing device count): throughput(N) / (N * throughput(1)).

On a real pod slice, devices are chips and the collective rides ICI/DCN; on
a dev box, run under the virtual CPU mesh (``--platform cpu --cpu-devices 8``
style config, or let tests/conftest.py-like config force it) to validate
the harness and the sharding layout.  Usage::

    python benchmarks/scaling.py [max_devices]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_dev: int, batch_per_device: int, repeats: int = 5) -> float:
    """Decoded info Mbit/s of the sharded sim step on n_dev devices."""
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import DecoderConfig, wimax
    from myldpccppapi_tpu.parallel import make_mesh, make_sharded_campaign_step

    code = wimax(576, "3/4B")
    cfg = DecoderConfig(schedule="layered", normalization=0.75, max_iters=40)
    mesh = make_mesh((n_dev,), ("data",), devices=jax.devices()[:n_dev])
    step = jax.jit(make_sharded_campaign_step(
        code, cfg, mesh, batch_per_device=batch_per_device, num_snr=1
    ))
    snr = jnp.asarray([5.0], jnp.float32)
    out = step(jax.random.PRNGKey(0), snr)
    jax.block_until_ready(out.frames)
    t0 = time.perf_counter()
    for i in range(repeats):
        out = step(jax.random.PRNGKey(i), snr)
    jax.block_until_ready(out.frames)
    dt = (time.perf_counter() - t0) / repeats
    frames = int(np.asarray(out.frames)[0])
    return frames * code.k / dt / 1e6


def collective_cost_model(step_ms: float, num_snr: int = 8,
                          stats_fields: int = 6) -> dict:
    """Analytic N-host efficiency bound for the sharded campaign step.

    The ONLY cross-device traffic in the decode pipeline is one all-reduce
    (``lax.psum``) of the per-SNR SimStats counters per step — everything
    else (channel sim, decode, error counting) is embarrassingly parallel
    over the batch axis.  The all-reduce moves
    ``bytes = stats_fields * 4 * num_snr`` per device per step: a
    LATENCY-dominated collective (a few hundred bytes), not a
    bandwidth-dominated one.

    Model: t_step(N) = t_compute + t_allreduce(N), with
    t_allreduce ≈ hops(N) * link_latency, hops = 2*(N-1)/ring or
    2*log2(N) tree — we take the pessimistic ring over DCN.  Efficiency
    = t_compute / t_step.  Link latencies: ~1 us/hop ICI (same pod
    slice), ~25 us/hop DCN (multi-host over data-center network).

    The model is deliberately simple because the traffic is trivially
    small: even at N=32 hosts over DCN, 2*31 hops * 25 us = 1.55 ms of
    collective time against a >= 40 ms compute step is <4% overhead —
    the >=85%% BASELINE target is met with an order of magnitude of
    headroom PROVIDED the per-device batch keeps t_compute >= ~10 ms.
    This is the quantitative claim the virtual-CPU-mesh runs cannot make
    (their "devices" share host cores, so measured efficiency ~0.5 is
    core-bound, not communication-bound).
    """
    bytes_per_step = stats_fields * 4 * num_snr
    out = {
        "bytes_allreduced_per_step": bytes_per_step,
        "compute_ms_per_step": step_ms,
        "model": "ring all-reduce, latency-dominated; eff = t_c/(t_c + hops*lat)",
        "predictions": [],
    }
    for fabric, lat_us in (("ici", 1.0), ("dcn", 25.0)):
        for n in (2, 4, 8, 16, 32):
            hops = 2 * (n - 1)
            t_coll_ms = hops * lat_us / 1e3 + bytes_per_step * (n - 1) / n / 100e9 * 1e3
            eff = step_ms / (step_ms + t_coll_ms)
            out["predictions"].append({
                "fabric": fabric, "hosts": n,
                "t_collective_ms": round(t_coll_ms, 4),
                "predicted_efficiency": round(eff, 4),
            })
    return out


def main() -> None:
    import jax

    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    platform = jax.devices()[0].platform
    batch_per_device = 512 if platform == "tpu" else 16
    rows = []
    base = None
    base_ms = None
    n = 1
    while n <= max_dev:
        mbits = measure(n, batch_per_device)
        if base is None:
            base = mbits
            from myldpccppapi_tpu import wimax

            base_ms = batch_per_device * wimax(576, "3/4B").k / (base * 1e3)
        eff = mbits / (n * base)
        rows.append({
            "devices": n,
            "throughput_mbits": round(mbits, 2),
            "efficiency": round(eff, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
        n *= 2
    model = collective_cost_model(step_ms=base_ms)
    print(json.dumps({"collective_cost_model": model}, indent=None), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps({
            "config": "scaling",
            "platform": platform,
            "batch_per_device": batch_per_device,
            # virtual CPU "devices" share host silicon: measured efficiency
            # there is core-bound and is NOT a communication measurement
            "measured_is_core_bound": platform != "tpu",
            "rows": rows,
            "collective_cost_model": model,
        }) + "\n")


if __name__ == "__main__":
    main()
