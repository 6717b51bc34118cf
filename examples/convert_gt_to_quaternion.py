#!/usr/bin/env python
"""Convert KITTI-format ground-truth poses (3x4 row-major per line) to the
TUM quaternion trajectory format — the reference's evaluation utility
(SingleRobotScenario Examples/Monocular/ConvertGTtoQuaternion.cc:20-40).

Usage: convert_gt_to_quaternion.py poses.txt [-o Quat.txt]
Each output line: ``tx ty tz qx qy qz qw`` with the rotation transposed
exactly as the reference does (world→camera to camera→world).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from orbslamm_tpu.io.trajectory import _rot_to_quat_np, load_kitti


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("poses", help="KITTI ground-truth poses file (3x4 rows)")
    ap.add_argument("-o", "--out", default="Quat.txt")
    args = ap.parse_args()

    T = load_kitti(args.poses)  # [N,4,4]
    with open(args.out, "w") as f:
        for Ti in T:
            R = Ti[:3, :3].T
            t = Ti[:3, 3]
            q = _rot_to_quat_np(R)  # [qx,qy,qz,qw]
            f.write(
                f"{t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )
    print(f"wrote {len(T)} poses to {args.out}")


if __name__ == "__main__":
    main()
