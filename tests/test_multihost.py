"""Multi-process (N-host software path) campaign validation.

Spawns REAL separate Python processes that form one JAX distributed job
(`jax.distributed.initialize`, CPU backend) and run the sharded campaign
step over a global mesh whose devices span process boundaries — the psum
of the SimStats crosses processes over Gloo/TCP, the software shape of the
BASELINE config-5 "N>=2 hosts with psum'd frame-error stats" requirement.

The oracle is exact: the step folds each device's GLOBAL mesh position
into the PRNG key, so statistics must be BIT-IDENTICAL no matter how the
same global mesh is partitioned into processes (2x2 vs 1x4 here).
"""
import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multihost.py")


@pytest.mark.slow
def test_two_process_campaign_bit_identical_to_single():
    out = subprocess.run(
        [sys.executable, SCRIPT, "--nproc", "2", "--local-devices", "2",
         "--batch-per-device", "8", "--snr", "4.0", "--repeats", "1",
         "--max-iters", "10", "--timeout", "240"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["stats_bit_identical_to_single_process"] is True
    assert report["all_ranks_agree"] is True
    assert report["global_devices"] == 4
