"""Benchmark: per-frame tracking throughput of the full SLAM session.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference targets real-time 30 fps/stream on TUM-class input
(BASELINE.md) on a desktop CPU; vs_baseline = fps / 30.

Runs a TUM-like configuration (640x480, 1000 ORB features, 8 pyramid
levels) on a rendered synthetic sequence. Warmup frames (jit compilation,
initialization) are excluded; the steady-state median frame latency in the
OK tracking state is reported.
"""

import json
import sys
import time

import numpy as np


def main():
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.models.system import MonocularSession
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

    n_frames = 90
    seq = make_sequence(n_frames=n_frames, n_points=2500, cam=cam, seed=7,
                        motion="forward")
    sess = MonocularSession(cfg)
    # streaming mode: the per-frame host sync is pipelined one frame behind
    # the dispatch, and the next image uploads while the current one computes
    sess.tracker.defer_sync = True
    device_imgs = [None] * n_frames
    device_imgs[0] = jax.device_put(seq.images[0])

    times = []
    ok_frames = 0
    for i in range(n_frames):
        t0 = time.perf_counter()
        if i + 1 < n_frames and device_imgs[i + 1] is None:
            device_imgs[i + 1] = jax.device_put(seq.images[i + 1])  # prefetch
        rec = sess.process_frame(device_imgs[i], float(seq.timestamps[i]))
        dt = time.perf_counter() - t0
        if rec.state == "OK":
            ok_frames += 1
            if ok_frames > 10:  # steady state: past compile + init
                times.append(dt)

    if len(times) < 5:
        print(json.dumps({
            "metric": "tracking_fps", "value": 0.0, "unit": "frames/s",
            "vs_baseline": 0.0, "error": "tracking failed to reach steady state",
        }))
        return 1

    med = float(np.median(times))
    fps = 1.0 / med
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
