"""Select the default synthetic NR base table by measured error floor.

All candidates are 4-cycle-free at the design lifting (girth >= 6,
``codes/nr._fill_girth6_shifts``); what separates them is the deeper cycle
/ trapped-set structure, which is impractical to optimize analytically but
cheap to MEASURE: this is exactly how published standard tables are
finalized.  For each candidate seed the script runs two operating points
of the BG1 Z=384 waterfall on the chip — one in the waterfall knee
(threshold quality) and one in the tail (floor quality) — and reports FER
at both; the winner becomes ``nr_base_graph``'s default seed.

Usage::

    python benchmarks/nr_table_select.py [bg] [seed seed ...]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")

KNEE_DB, KNEE_FRAMES = -1.25, 32768
TAIL_DB, TAIL_FRAMES = -0.75, 131072
BATCH = 512


def eval_seed(bg: int, seed: int) -> dict:
    import jax
    import jax.numpy as jnp

    from myldpccppapi_tpu import DecoderConfig
    from myldpccppapi_tpu.codes.nr import nr_base_graph, nr_code, triangular_encode_fn
    from myldpccppapi_tpu.parallel import make_mesh, make_sharded_campaign_step

    code = nr_code(z=384, bg=bg, table=nr_base_graph(bg, seed=seed))
    cfg = DecoderConfig(schedule="layered", normalization=0.8, max_iters=30)
    mesh = make_mesh((len(jax.devices()),), ("data",))
    step = jax.jit(make_sharded_campaign_step(
        code, cfg, mesh, batch_per_device=BATCH // len(jax.devices()),
        num_snr=1, encode_fn=triangular_encode_fn(code)))

    def fer_at(snr_db: float, frames: int, seed0: int) -> tuple:
        errs = tot = 0
        s = seed0
        while tot < frames:
            stats = step(jax.random.PRNGKey(s),
                         jnp.asarray([snr_db], jnp.float32))
            errs += int(np.asarray(stats.frame_errors)[0])
            tot += int(np.asarray(stats.frames)[0])
            s += 1
        return errs / tot, errs, tot

    knee, ke, kt = fer_at(KNEE_DB, KNEE_FRAMES, 10_000 * (seed + 1))
    tail, te, tt = fer_at(TAIL_DB, TAIL_FRAMES, 20_000 * (seed + 1))
    rec = {"config": "nr_table_select", "bg": bg, "seed": seed,
           "knee_db": KNEE_DB, "knee_fer": round(knee, 6),
           "knee_errors": ke, "knee_frames": kt,
           "tail_db": TAIL_DB, "tail_fer": round(tail, 7),
           "tail_errors": te, "tail_frames": tt}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    args = sys.argv[1:]
    bg = int(args[0]) if args else 1
    seeds = [int(s) for s in args[1:]] or [0, 1, 2, 3]
    recs = [eval_seed(bg, s) for s in seeds]
    best = min(recs, key=lambda r: (r["tail_fer"], r["knee_fer"]))
    print(json.dumps({"config": "nr_table_select_best", "bg": bg,
                      "seed": best["seed"], "tail_fer": best["tail_fer"],
                      "knee_fer": best["knee_fer"]}), flush=True)
    with open(RESULTS, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
