"""Waterfall campaign: stopping criteria, checkpoint/resume, reporting."""
import json

import numpy as np
import pytest

from myldpccppapi_tpu.campaign import CampaignConfig, PointStats, WaterfallCampaign
from myldpccppapi_tpu.parallel.sim import SimStats


def _fake_step(fer_by_snr):
    """Deterministic fake step_fn: 100 frames/step, fer*100 errors each."""

    def step(seed, snr_db):
        fer = fer_by_snr[float(snr_db)]
        frames = 100
        fe = int(round(fer * frames))
        return SimStats(
            frames=np.int64(frames),
            frame_errors=np.int64(fe),
            bit_errors=np.int64(fe * 3),
            info_bits=np.int64(frames * 432),
            iterations=np.int64(frames * 5),
            unconverged=np.int64(fe),
        )

    return step


def test_stops_on_frame_errors():
    cfg = CampaignConfig(snr_db=[1.0, 5.0], min_frame_errors=50, max_frames=10_000)
    camp = WaterfallCampaign(
        cfg, _fake_step({1.0: 0.5, 5.0: 0.0}), frames_per_step=100
    )
    pts = camp.run()
    # noisy point: 50 errors after 1 step; clean point: runs to max_frames
    assert pts[0].frame_errors >= 50 and pts[0].frames == 100
    assert pts[1].frames == 10_000 and pts[1].frame_errors == 0
    assert pts[0].fer == pytest.approx(0.5)
    assert pts[1].ber == 0.0


def test_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "ck.json")
    cfg = CampaignConfig(snr_db=[2.0], min_frame_errors=40, max_frames=1_000)
    step = _fake_step({2.0: 0.1})
    c1 = WaterfallCampaign(cfg, step, 100, fingerprint="fp1", checkpoint_path=ck)
    # run two steps manually then checkpoint
    c1.points[0].frames = 200
    c1.points[0].frame_errors = 20
    c1.steps_done[0] = 2
    c1.save()
    c2 = WaterfallCampaign(cfg, step, 100, fingerprint="fp1", checkpoint_path=ck)
    assert c2.points[0].frames == 200 and c2.steps_done[0] == 2
    pts = c2.run()
    # resumes from 200 frames / 20 errors: needs 2 more steps to reach 40
    assert pts[0].frame_errors == 40 and pts[0].frames == 400
    # a different fingerprint must NOT resume
    c3 = WaterfallCampaign(cfg, step, 100, fingerprint="other", checkpoint_path=ck)
    assert c3.points[0].frames == 0


def test_report_and_csv(tmp_path):
    cfg = CampaignConfig(snr_db=[1.0], min_frame_errors=10, max_frames=100)
    camp = WaterfallCampaign(cfg, _fake_step({1.0: 0.2}), 100)
    camp.run()
    rep = camp.report()
    assert rep["points"][0]["fer"] == pytest.approx(0.2)
    p = tmp_path / "out.csv"
    camp.write_csv(str(p))
    lines = p.read_text().strip().split("\n")
    assert len(lines) == 2 and lines[0].startswith("snr_db,")


def test_ci95():
    p = PointStats(1.0, frames=10_000, frame_errors=100)
    assert 0.001 < p.fer_ci95() < 0.01
