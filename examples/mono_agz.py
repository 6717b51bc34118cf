#!/usr/bin/env python
"""AGZ (Zurich urban MAV) monocular driver (reference SingleRobotScenario
Examples/Monocular/mono_AGZ.cc). Processes every 5th frame like the
reference's main loop (mono_AGZ.cc ``ni+=5``).

Usage: mono_agz.py path_to_settings path_to_sequence [1_for_multi_maps]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from orbslamm_tpu.driver import RobotFeed, autodetect_image_size, run_robots
from orbslamm_tpu.io.datasets import load_agz_sequence
from orbslamm_tpu.utils.config import load_settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("--vocabulary", default=None,
                    help="pretrained DBoW2 ORBvoc.txt (reference CLI arg 1); "
                         "default: train on-device")
    ap.add_argument("sequence", help="folder with filenames.txt + MAVImages/")
    ap.add_argument("multi_maps", nargs="?", default="1")
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--out", default="out_agz")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viewer", type=int, default=0,
                    help="serve a live map dashboard on this port")
    args = ap.parse_args()

    cfg = load_settings(args.settings)
    if args.vocabulary:
        cfg = cfg.replace(vocabulary_path=args.vocabulary)
    cfg = cfg.replace(multi_mapping=args.multi_maps == "1")
    seq = load_agz_sequence(args.sequence, stride=args.stride)
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)
    cfg = autodetect_image_size(cfg, seq.frame(0))

    def frames():
        for i in range(n):
            yield seq.timestamps[i], seq.frame(i)

    run_robots(cfg, [RobotFeed(frames(), "robot0")], out_dir=args.out)


if __name__ == "__main__":
    main()
