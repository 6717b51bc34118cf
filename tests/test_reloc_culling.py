"""Relocalization (recovery path A) and keyframe culling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models import local_mapping as lms
from orbslamm_tpu.models.system import MonocularSession
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

CAM = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
    capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
    tracking=TrackingConfig(
        pixel_noise=1.2, min_matches_init=55,
        init_min_triangulated=30, init_min_parallax_deg=0.4,
    ),
    multi_mapping=False,  # single-map mode → LOST triggers relocalization
)


@pytest.mark.slow
def test_relocalization_after_blackout():
    """Track, blank the camera for a few frames (forced loss), then resume at
    a previously-seen viewpoint — the tracker must relocalize via PnP."""
    seq = make_sequence(n_frames=60, n_points=1400, cam=CAM, seed=7, motion="strafe")
    sess = MonocularSession(CFG)
    blank = np.full_like(seq.images[0], 30)
    states = []
    for i in range(40):
        img = blank if 28 <= i < 32 else seq.images[min(i, 27) if i >= 32 else i]
        rec = sess.process_frame(img, float(seq.timestamps[i]))
        states.append(rec.state)
    assert "LOST" in states, "blackout should lose tracking"
    assert states[-1] == "OK", f"relocalization failed: {states[-8:]}"
    # relocalized pose must be near the pose it had at the revisited frame
    ok_before = [f for f in sess.frames if f.state == "OK" and f.frame_id <= 27]
    T_then = ok_before[-1].T_cw
    T_now = sess.frames[-1].T_cw
    C_then = -T_then[:3, :3].T @ T_then[:3, 3]
    C_now = -T_now[:3, :3].T @ T_now[:3, 3]
    assert np.linalg.norm(C_then - C_now) < 0.15, (C_then, C_now)


@pytest.mark.slow
def test_keyframe_culling_bounds_redundancy():
    """A slow sequence re-seeing the same scene accumulates redundant
    keyframes; culling must remove some while tracking survives."""
    seq = make_sequence(n_frames=60, n_points=1400, cam=CAM, seed=7, motion="strafe")
    sess = MonocularSession(CFG)
    for i in range(len(seq.images)):
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    m = sess.map
    n_alloc = sess.n_kf
    n_valid = int(np.asarray(m.kf_valid).sum())
    assert n_valid >= 5  # still a functioning map
    # slot 0 (origin) must never be culled
    assert bool(m.kf_valid[0])
    # culled keyframes left no dangling observations
    kv = np.asarray(m.kf_valid)
    obs = np.asarray(m.kf_obs_lm)
    assert (obs[~kv] == -1).all()
