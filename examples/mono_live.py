#!/usr/bin/env python
"""Live-camera monocular driver (reference Examples/Monocular/mono_Bebop.cc).

Usage: mono_live.py path_to_settings video_source [1_for_multi_maps]

``video_source`` is an OpenCV VideoCapture source: a V4L2 device index
(e.g. ``0``, or the v4l2loopback device the reference's Bebop
H.264-FIFO pipeline feeds — SettingUpBebop/, Thirdparty/v4l2loopback/),
or a video file / URL. Frames are consumed at capture rate.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from orbslamm_tpu.driver import RobotFeed, autodetect_image_size, run_robots
from orbslamm_tpu.io.datasets import video_capture_frames
from orbslamm_tpu.utils.config import load_settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("--vocabulary", default=None,
                    help="pretrained DBoW2 ORBvoc.txt (reference CLI arg 1); "
                         "default: train on-device")
    ap.add_argument("source", help="device index, video file, or stream URL")
    ap.add_argument("multi_maps", nargs="?", default="1")
    ap.add_argument("--out", default="out_live")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viewer", type=int, default=0,
                    help="serve a live map dashboard on this port")
    args = ap.parse_args()

    cfg = load_settings(args.settings)
    if args.vocabulary:
        cfg = cfg.replace(vocabulary_path=args.vocabulary)
    cfg = cfg.replace(multi_mapping=args.multi_maps == "1")
    src = int(args.source) if args.source.isdigit() else args.source
    frames = video_capture_frames(src, max_frames=args.max_frames)
    ts0, img0 = next(frames)
    cfg = autodetect_image_size(cfg, img0)

    def stream():
        yield ts0, img0
        yield from frames

    run_robots(cfg, [RobotFeed(stream(), "robot0")], out_dir=args.out)


if __name__ == "__main__":
    main()
