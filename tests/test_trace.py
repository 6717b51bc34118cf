"""Tracing/metrics layer (SURVEY.md §5.1/§5.5 — the reference has only
manual chrono spans + couts; this is the structured replacement)."""

import json
import threading
import time

from orbslamm_tpu.utils.trace import Tracer, get_tracer


def test_span_stats_and_report(tmp_path):
    tr = Tracer()
    for _ in range(5):
        with tr.span("stage_a"):
            time.sleep(0.001)
    with tr.span("stage_b"):
        pass
    s = tr.stage_summary()
    assert s["stage_a"]["count"] == 5
    assert s["stage_a"]["median_ms"] >= 1.0
    assert s["stage_b"]["count"] == 1
    tr.save_report(tmp_path / "r.json")
    rep = json.loads((tmp_path / "r.json").read_text())
    assert "stage_a" in rep["stages"]


def test_events_counters_gauges(tmp_path):
    tr = Tracer()
    tr.event("loop_closed", map_id=0, slot=12)
    tr.event("map_merge", absorbed=1, base=0)
    tr.incr("keyframes_inserted")
    tr.incr("keyframes_inserted")
    tr.gauge("n_landmarks", 1234)
    assert len(tr.events("map_merge")) == 1
    assert tr.metrics()["counters"]["keyframes_inserted"] == 2
    assert tr.metrics()["gauges"]["n_landmarks"] == 1234
    tr.save_events(tmp_path / "e.jsonl")
    lines = (tmp_path / "e.jsonl").read_text().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["kind"] == "loop_closed"


def test_chrome_trace_export(tmp_path):
    tr = Tracer()
    tr.keep_chrome_trace = True
    with tr.span("jitted_step", frame=3):
        pass
    tr.save_chrome_trace(tmp_path / "t.json")
    evs = json.loads((tmp_path / "t.json").read_text())["traceEvents"]
    assert evs and evs[0]["name"] == "jitted_step" and evs[0]["ph"] == "X"


def test_disabled_tracer_is_noop():
    tr = Tracer(enabled=False)
    with tr.span("x"):
        pass
    tr.event("y")
    tr.incr("z")
    assert tr.stage_summary() == {} and tr.events() == []


def test_thread_safety():
    tr = Tracer()

    def work():
        for _ in range(200):
            with tr.span("s"):
                pass
            tr.incr("c")

    threads = [threading.Thread(target=work) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert tr.stage_summary()["s"]["count"] == 800
    assert tr.metrics()["counters"]["c"] == 800


def test_pipeline_emits_trace(tmp_path):
    """A short session must populate track/local_mapping spans and
    keyframe events through the default tracer."""
    import numpy as np

    from orbslamm_tpu.driver import RobotFeed, run_robots
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
    )

    get_tracer().reset()
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55,
            init_min_triangulated=30, init_min_parallax_deg=0.4,
            new_kf_max_frames=4,  # force keyframe inserts in a short run
        ),
    )
    seq = make_sequence(n_frames=16, n_points=1400, cam=cam, seed=7)

    def gen():
        for i in range(16):
            yield seq.timestamps[i], np.asarray(seq.images[i])

    run_robots(cfg, [RobotFeed(gen(), "r0")], out_dir=tmp_path / "out",
               verbose=False)
    tr = get_tracer()
    stages = tr.stage_summary()
    # the driver spans "track" once per dispatch: per-frame spans during
    # initialization plus one span per chunk in the pipelined path
    assert stages["track"]["count"] >= 2
    # local mapping runs inside the fused on-device step; its keyframe
    # events are still surfaced host-side
    assert tr.events("keyframe")
    assert tr.metrics()["counters"]["keyframes_inserted"] >= 1
    assert (tmp_path / "out" / "trace_report.json").exists()
    assert (tmp_path / "out" / "events.jsonl").exists()
