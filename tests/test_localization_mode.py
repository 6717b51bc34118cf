"""Localization-only mode: track against a frozen map without extending it.

Reference behavior: System::ActivateLocalizationMode (System.cc:375) stops
LocalMapping and sets Tracking::mbOnlyTracking — frames are localized against
the existing map, no keyframes/landmarks are created, and tracking loss falls
back to Relocalization (Tracking.cc:1404) instead of spawning a new map.
"""

import numpy as np
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import MonocularSession, TrackingState
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
    tracking=TrackingConfig(
        pixel_noise=1.2,
        min_matches_init=55,
        init_min_triangulated=30,
        init_min_parallax_deg=0.4,
    ),
)


@pytest.mark.slow
def test_localization_mode_freezes_map():
    seq = make_sequence(n_frames=44, n_points=900, cam=CAM, seed=7, motion="forward")
    sess = MonocularSession(CFG)
    # Phase 1: SLAM the first 2/3 of the sequence (build the map).
    n_map = 30
    for i in range(n_map):
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    assert sess.state == TrackingState.OK
    kf_before = sess.n_kf
    lm_before = int(np.asarray(sess.map.lm_valid).sum())
    assert kf_before >= 3

    # Phase 2: localization mode over the remaining frames.
    sess.activate_localization_mode()
    ok_frames = 0
    for i in range(n_map, len(seq.images)):
        rec = sess.process_frame(seq.images[i], float(seq.timestamps[i]))
        if rec.state == "OK":
            ok_frames += 1
    # map is frozen: no new keyframes, no new landmarks
    assert sess.n_kf == kf_before
    assert int(np.asarray(sess.map.lm_valid).sum()) == lm_before
    # and we still localized through (most of) the held-out tail
    assert ok_frames >= (len(seq.images) - n_map) // 2

    # Phase 3: deactivating re-enables mapping.
    sess.deactivate_localization_mode()
    assert sess.tracker.localization_only is False


@pytest.mark.slow
def test_localization_mode_relocalizes_on_loaded_map():
    """Start a FRESH tracker in localization mode on an already-built map —
    the load-map-then-localize workflow (System::LoadMap + localization)."""
    from orbslamm_tpu.models.system import RobotTracker

    seq = make_sequence(n_frames=36, n_points=900, cam=CAM, seed=7, motion="forward")
    sess = MonocularSession(CFG)
    for i in range(30):
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    assert sess.n_kf >= 3
    sess.activate_localization_mode()

    fresh = RobotTracker(CFG, sess.tracker.mapctx, name="reloc_robot")
    fresh.localization_only = True
    ok = 0
    for i in range(10, 30, 2):  # revisit frames the map has seen
        rec = fresh.process_frame(seq.images[i], float(seq.timestamps[i]))
        if rec.state == "OK":
            ok += 1
    assert ok >= 3, f"fresh localization-only tracker localized {ok} frames"
    assert sess.n_kf == fresh.mapctx.n_kf  # nothing was added
