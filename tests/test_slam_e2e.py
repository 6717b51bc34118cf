"""End-to-end monocular SLAM session tests on rendered synthetic sequences.

This is the pipeline-integration layer of the test pyramid (SURVEY.md §4):
images in → ORB → init → tracking → keyframes → triangulation → local BA →
trajectory out, with ATE checked against rendered ground truth.
"""

import numpy as np
import pytest

from orbslamm_tpu.eval.ate import ate_from_poses
from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import MonocularSession
from orbslamm_tpu.utils.config import (
    CameraConfig,
    CapacityConfig,
    OrbConfig,
    SlamConfig,
    TrackingConfig,
)

CAM = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=400, max_keypoints=1024, n_levels=4),
    capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
    tracking=TrackingConfig(pixel_noise=1.2, min_matches_init=55, init_min_triangulated=30, init_min_parallax_deg=0.4),
)


def run_session(seq, cfg=CFG):
    sess = MonocularSession(cfg)
    lost = 0
    for i in range(len(seq.images)):
        rec = sess.process_frame(seq.images[i], float(seq.timestamps[i]))
        if rec.state == "LOST":
            lost += 1
    return sess, lost


@pytest.mark.slow
def test_vo_forward_motion():
    seq = make_sequence(n_frames=45, n_points=900, cam=CAM, seed=7, motion="forward")
    sess, lost = run_session(seq)
    # integration guard, not an accuracy benchmark: the low-feature synthetic
    # regime is marginal and RNG-stream sensitive — require a substantial
    # tracked stretch, not perfection
    assert lost <= 15, f"tracking lost for {lost} frames"
    ts, est = sess.frame_trajectory()
    assert len(est) > 25, f"only {len(est)} frames tracked"
    idx = [int(round(t * CAM.fps)) for t in ts]
    ate = ate_from_poses(est, seq.poses_cw[idx])
    # drift bound scaled to the tracked span: a run that tracks 40/45 frames
    # accumulates proportionally more drift than one that dies at 29 — both
    # are acceptable here, losing tracking early to keep ATE low is not
    # better behavior
    assert ate < 0.005 * len(est), f"ATE {ate} over {len(est)} frames"
    # the map grew and keyframes were created
    assert sess.n_kf >= 5
    assert int(sess.map.lm_valid.sum()) > 150


@pytest.mark.slow
def test_vo_strafe_motion():
    seq = make_sequence(n_frames=60, n_points=900, cam=CAM, seed=7, motion="strafe")
    sess, lost = run_session(seq)
    assert lost == 0
    ts, est = sess.frame_trajectory()
    assert len(est) > 35
    idx = [int(round(t * CAM.fps)) for t in ts]
    ate = ate_from_poses(est, seq.poses_cw[idx])
    assert ate < 0.45, f"ATE {ate}"  # guard against catastrophic drift; value varies ~±0.1 across RNG streams


@pytest.mark.slow
def test_trajectory_output_formats(tmp_path):
    from orbslamm_tpu.io import trajectory as tio

    seq = make_sequence(n_frames=45, n_points=900, cam=CAM, seed=7, motion="forward")
    sess, _ = run_session(seq)
    ts, est = sess.frame_trajectory()
    tio.save_tum(tmp_path / "f.txt", ts, est)
    kts, kp = sess.keyframe_trajectory()
    tio.save_tum(tmp_path / "kf.txt", kts, kp)
    t2, tq = tio.load_tum(tmp_path / "kf.txt")
    assert len(t2) == len(kp)
