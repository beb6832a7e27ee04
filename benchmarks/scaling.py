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


def main() -> None:
    import jax

    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    batch_per_device = 512 if jax.devices()[0].platform == "tpu" else 16
    rows = []
    base = None
    n = 1
    while n <= max_dev:
        mbits = measure(n, batch_per_device)
        if base is None:
            base = mbits
        eff = mbits / (n * base)
        rows.append({
            "devices": n,
            "throughput_mbits": round(mbits, 2),
            "efficiency": round(eff, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
        n *= 2
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps({
            "config": "scaling",
            "platform": jax.devices()[0].platform,
            "batch_per_device": batch_per_device,
            "rows": rows,
        }) + "\n")


if __name__ == "__main__":
    main()
