#!/usr/bin/env python
"""TUM monocular driver (reference Examples/Monocular/mono_tum.cc).

Usage: mono_tum.py path_to_settings path_to_sequence [1_for_multi_maps]
Like the reference's MultipleRobotsScenario variant, --two-robots splits the
sequence in half and runs both halves concurrently through one MultiMapper
(mono_tum.cc:74-114).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from orbslamm_tpu.driver import RobotFeed, run_robots
from orbslamm_tpu.io.datasets import load_tum_sequence
from orbslamm_tpu.utils.config import load_settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("--vocabulary", default=None,
                    help="pretrained DBoW2 ORBvoc.txt (reference CLI arg 1); "
                         "default: train on-device")
    ap.add_argument("sequence")
    ap.add_argument("multi_maps", nargs="?", default="1")
    ap.add_argument("--two-robots", action="store_true")
    ap.add_argument("--out", default="out_tum")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viewer", type=int, default=0,
                    help="serve a live map dashboard on this port")
    args = ap.parse_args()

    cfg = load_settings(args.settings)
    if args.vocabulary:
        cfg = cfg.replace(vocabulary_path=args.vocabulary)
    cfg = cfg.replace(multi_mapping=args.multi_maps == "1")
    seq = load_tum_sequence(args.sequence)
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)

    from orbslamm_tpu.driver import autodetect_image_size

    cfg = autodetect_image_size(cfg, seq.frame(0))

    def frames(lo, hi):
        for i in range(lo, hi):
            yield seq.timestamps[i], seq.frame(i)

    if args.two_robots:
        half = n // 2
        feeds = [
            RobotFeed(frames(0, half - 200 if half > 200 else half), "robot0"),
            RobotFeed(frames(half, n), "robot1"),
        ]
    else:
        feeds = [RobotFeed(frames(0, n), "robot0")]
    run_robots(cfg, feeds, out_dir=args.out,
               viewer_port=args.viewer or None)


if __name__ == "__main__":
    main()
