"""Benchmark: per-frame tracking throughput of the full SLAM session.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference targets real-time 30 fps/stream on TUM-class input
(BASELINE.md) on a desktop CPU; vs_baseline = fps / 30.

Runs a TUM-like configuration (640x480, 1000 ORB features, 8 pyramid
levels) on a rendered synthetic sequence through the CHUNKED streaming
path (models/fused.make_chunk_step): N frames per device dispatch, one
host sync per chunk — the deployment configuration for remote-attached
TPUs where every host sync costs a network round trip. Warmup
(jit compilation, two-view initialization) is excluded; steady-state
throughput over the tracked frames is reported.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/orbslamm_jax_cache")

CHUNK = 8


def main():
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.models.system import MonocularSession, TrackingState
    from orbslamm_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
    )

    cam = CameraConfig(width=640, height=480, fx=520.9, fy=521.0, cx=325.1,
                       cy=249.7, fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1000, max_keypoints=2048),
        capacity=CapacityConfig(max_keyframes=128, max_landmarks=8192),
        tracking=TrackingConfig(pixel_noise=1.2),
    )
    import jax

    n_frames = 248
    seq = make_sequence(n_frames=n_frames, n_points=2500, cam=cam, seed=7,
                        motion="forward")
    sess = MonocularSession(cfg)
    sess.tracker.chunk_size = CHUNK

    # warmup: initialize (per-frame path) and run two chunks so every
    # steady-state program is compiled before the clock starts
    i = 0
    while sess.state != TrackingState.OK and i < n_frames:
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
        i += 1
    if sess.state != TrackingState.OK:
        print(json.dumps({
            "metric": "tracking_fps", "value": 0.0, "unit": "frames/s",
            "vs_baseline": 0.0, "error": "initialization failed",
        }))
        return 1
    for _ in range(2):
        sess.process_frames(seq.images[i : i + CHUNK],
                            seq.timestamps[i : i + CHUNK])
        i += CHUNK

    # steady state: stream the remaining frames chunk by chunk
    t0 = time.perf_counter()
    n_meas = 0
    n_ok = 0
    while i + CHUNK <= n_frames and sess.state == TrackingState.OK:
        recs = sess.process_frames(seq.images[i : i + CHUNK],
                                   seq.timestamps[i : i + CHUNK])
        n_ok += sum(1 for r in recs if r.state == "OK")
        n_meas += CHUNK
        i += CHUNK
    wall = time.perf_counter() - t0

    if n_ok < 5 * CHUNK:
        print(json.dumps({
            "metric": "tracking_fps", "value": 0.0, "unit": "frames/s",
            "vs_baseline": 0.0, "error": "tracking failed to reach steady state",
        }))
        return 1

    fps = n_meas / wall
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
