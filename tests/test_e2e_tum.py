"""End-to-end dataset-path test: synthetic sequence exported to the TUM
RGB-D on-disk layout, loaded back through the REAL loader + decoder stack,
driven through the examples/mono_tum.py CLI main, trajectories saved and
ATE evaluated — the full reference workflow (mono_tum.cc:46-230:
LoadImages → System → TrackMonocular loop → SaveKeyFrameTrajectoryTUM)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from orbslamm_tpu.io.datasets import load_tum_sequence
from orbslamm_tpu.io.synthetic import export_tum_sequence, make_sequence
from orbslamm_tpu.io.trajectory import load_tum
from orbslamm_tpu.utils.config import CameraConfig


@pytest.mark.slow
def test_tum_cli_end_to_end(tmp_path):
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120,
                       fps=30)
    seq = make_sequence(n_frames=60, n_points=900, cam=cam, seed=7,
                        motion="forward")
    root = export_tum_sequence(seq, tmp_path / "seq")

    # loader round trip (LoadImages analog)
    loaded = load_tum_sequence(root)
    assert len(loaded) == 60
    assert loaded.frame(0).shape == (240, 320)
    assert np.allclose(loaded.timestamps, seq.timestamps, atol=1e-5)

    # drive the example CLI main in-process (the reference's driver loop)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import mono_tum

    out = tmp_path / "out"
    argv = sys.argv
    sys.argv = [
        "mono_tum.py", str(root / "settings.yaml"), str(root),
        "1", "--out", str(out),
    ]
    try:
        mono_tum.main()
    finally:
        sys.argv = argv

    # trajectory files written (SaveKeyFrameTrajectoryTUM analog)
    traj_files = sorted(out.glob("*robot0*.txt")) or sorted(out.glob("*.txt"))
    assert traj_files, f"no trajectory written in {out}"
    stamps, rows = load_tum(traj_files[0])  # [T,7] world tx ty tz qx qy qz qw
    assert len(stamps) >= 20, f"only {len(stamps)} poses in {traj_files[0]}"
    idx = [int(round(t * cam.fps)) for t in stamps]
    est_c = rows[:, 0:3]
    gt = seq.poses_cw[idx]
    gt_c = -np.einsum("nij,nj->ni", np.transpose(gt[:, :3, :3], (0, 2, 1)),
                      gt[:, :3, 3])
    from orbslamm_tpu.eval.ate import ate_rmse

    ate = ate_rmse(est_c, gt_c)
    assert ate < 0.25, f"end-to-end ATE {ate:.3f}"
