#!/usr/bin/env python
"""Flagship two-robot driver: two DIFFERENT KITTI sequences with different
calibrations, one shared MultiMapper (reference mono_kitti_dif-Seq.cc —
"the first SLAM system working simultaneously on KITTI 00 and 07").

Usage: mono_kitti_dif_seq.py settings1 seq1 multi_maps seq2 settings2
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from orbslamm_tpu.driver import RobotFeed, run_robots
from orbslamm_tpu.io.datasets import load_kitti_sequence
from orbslamm_tpu.utils.config import load_settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings1")
    ap.add_argument("seq1")
    ap.add_argument("multi_maps", nargs="?", default="1")
    ap.add_argument("seq2")
    ap.add_argument("settings2")
    ap.add_argument("--vocabulary", default=None,
                    help="pretrained DBoW2 ORBvoc.txt (reference CLI arg 1)")
    ap.add_argument("--out", default="out_kitti2")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viewer", type=int, default=0,
                    help="serve a live map dashboard on this port")
    args = ap.parse_args()

    # NOTE: per-robot calibrations are supported (kf_K is per-keyframe), but
    # one SlamConfig drives extraction; robot-specific extractor configs are
    # taken from each settings file.
    cfg = load_settings(args.settings1).replace(
        multi_mapping=args.multi_maps == "1",
        vocabulary_path=args.vocabulary,
    )
    s1 = load_kitti_sequence(args.seq1)
    s2 = load_kitti_sequence(args.seq2)

    from orbslamm_tpu.driver import autodetect_image_size

    cfg = autodetect_image_size(cfg, s1.frame(0))

    def frames(seq, n):
        for i in range(n):
            yield seq.timestamps[i], seq.frame(i)

    n1 = len(s1) if not args.max_frames else min(len(s1), args.max_frames)
    n2 = len(s2) if not args.max_frames else min(len(s2), args.max_frames)
    feeds = [RobotFeed(frames(s1, n1), "robot0"), RobotFeed(frames(s2, n2), "robot1")]
    run_robots(cfg, feeds, out_dir=args.out,
               viewer_port=args.viewer or None)


if __name__ == "__main__":
    main()
