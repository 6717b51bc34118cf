#!/usr/bin/env python
"""Self-contained demo on the synthetic renderer — no dataset needed.

Runs a kidnap scenario (tracking loss → new map) with one robot, or a
two-robot overlapping run, and writes trajectories + map renderings.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from orbslamm_tpu.driver import RobotFeed, run_robots
from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", choices=["kidnap", "two-robot", "vo"], default="kidnap")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="out_synthetic")
    args = ap.parse_args()

    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55,
            init_min_triangulated=30, init_min_parallax_deg=0.4,
        ),
    )

    def to_feed(seq, lo, hi, name):
        def gen():
            for i in range(lo, hi):
                yield seq.timestamps[i], seq.images[i]
        return RobotFeed(gen(), name)

    if args.scenario == "kidnap":
        seq = make_sequence(n_frames=args.frames, n_points=1400, cam=cam, seed=7,
                            kidnap_at=args.frames // 2)
        feeds = [to_feed(seq, 0, args.frames, "robot0")]
    elif args.scenario == "two-robot":
        seq = make_sequence(n_frames=args.frames, n_points=1400, cam=cam, seed=7)
        half = args.frames // 2
        feeds = [to_feed(seq, 0, half + 8, "robot0"), to_feed(seq, half, args.frames, "robot1")]
    else:
        seq = make_sequence(n_frames=args.frames, n_points=1400, cam=cam, seed=7)
        feeds = [to_feed(seq, 0, args.frames, "robot0")]
    run_robots(cfg, feeds, out_dir=args.out,
               viewer_port=args.viewer or None)


if __name__ == "__main__":
    main()
