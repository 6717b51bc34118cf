"""Reference-keyframe trajectory reconstruction (System.cc:470-499).

The reference never freezes frame poses: SaveTrajectory* recovers every
frame as T_rel · T_refKF at save time, so the whole trajectory rides later
loop/GBA/merge corrections. These tests pin that semantic for the
TPU-native FrameRecord (ref_slot, T_rel) decomposition.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import (
    MonocularSession, TrackingState, resolve_frame_poses,
)
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

CAM = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=400, max_keypoints=1024, n_levels=4),
    capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
    tracking=TrackingConfig(
        pixel_noise=1.2, min_matches_init=55, init_min_triangulated=30,
        init_min_parallax_deg=0.4,
    ),
)


def _tracked_session(n_frames=30, seed=7):
    seq = make_sequence(n_frames=n_frames, n_points=1200, cam=CAM, seed=seed,
                        motion="forward")
    sess = MonocularSession(CFG)
    sess.enable_loop_closing = False
    for i in range(n_frames):
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    assert sess.state == TrackingState.OK
    return sess, seq


def test_records_carry_reference_decomposition():
    from orbslamm_tpu.eval.ate import ate_from_poses

    sess, seq = _tracked_session()
    # early-loss resets may discard young map generations; records of dead
    # generations are orphaned by design — assert on the LIVE map's records
    live_id = sess.tracker.mapctx.map_id
    ok = [f for f in sess.frames if f.state == "OK" and f.map_id == live_id]
    assert len(ok) > 12
    mc = sess.tracker.mapctx
    for f in ok:
        assert f.ref_slot >= 0, f"OK frame {f.frame_id} has no reference KF"
        assert f.ref_slot < mc.n_kf
        assert f.T_rel is not None
    # resolution rides the map's CURRENT (locally BA-refined) keyframe
    # poses, so it must track the frozen records' accuracy closely
    idx = [int(round(f.timestamp * CAM.fps)) for f in ok]
    gt = seq.poses_cw[idx]
    ate_frozen = ate_from_poses(np.stack([f.T_cw for f in ok]), gt)
    ate_resolved = ate_from_poses(np.stack(resolve_frame_poses(ok)), gt)
    assert ate_resolved < max(0.3, ate_frozen * 1.2), (
        f"resolution degraded ATE: {ate_frozen:.4f} -> {ate_resolved:.4f}"
    )


def test_resolved_poses_ride_map_corrections():
    """Move the map under the records (what a loop correction / GBA does):
    every pre-correction frame's RESOLVED pose must follow, while the
    frozen T_cw stays put — the exact defect class VERDICT r4 measured as
    merged ATE 0.375 m vs single 0.054 m."""
    sess, seq = _tracked_session()
    live_id = sess.tracker.mapctx.map_id
    ok = [f for f in sess.frames if f.state == "OK" and f.map_id == live_id]
    before = resolve_frame_poses(ok)
    # rigid shift of the whole map (a gauge move): x' = x + d
    mc = sess.tracker.mapctx
    d = np.array([0.5, -0.2, 0.3], np.float32)
    kf_pose = np.asarray(mc.map.kf_pose).copy()
    # camera-from-world with world shifted: T' = T @ [I, -d]
    A = np.eye(4, dtype=np.float32)
    A[:3, 3] = -d
    mc.map = mc.map._replace(kf_pose=jnp.asarray(kf_pose @ A))
    after = resolve_frame_poses(ok)
    for f, Tb, Ta in zip(ok, before, after):
        np.testing.assert_allclose(Ta, Tb @ A, atol=1e-4)
        # the frozen record itself is untouched by resolution
        assert f.T_cw is not Ta


def test_orphaned_records_fall_back_to_frozen():
    """Records whose map generation was reset (early-loss reset renews the
    map_id) must NOT resolve against the new generation's keyframes."""
    sess, seq = _tracked_session()
    live_id = sess.tracker.mapctx.map_id
    ok = [f for f in sess.frames if f.state == "OK" and f.map_id == live_id]
    old_id = sess.tracker.mapctx.map_id
    frozen = [np.array(f.T_cw) for f in ok]
    sess.tracker.mapctx.renew_id()
    assert sess.tracker.mapctx.map_id != old_id
    out = resolve_frame_poses(ok)
    for T, F in zip(out, frozen):
        np.testing.assert_array_equal(T, F)


@pytest.mark.slow
def test_pre_loop_frames_move_after_loop_closure():
    """VERDICT r4 item 2's Done-criterion: after a loop closure, frames
    recorded BEFORE the loop must move with the corrected keyframes."""
    import dataclasses

    from pathlib import Path

    vocab = (Path(__file__).resolve().parents[1] / "orbslamm_tpu" / "data"
             / "vocab_10x4.npz")
    cfg = CFG.replace(
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=96, max_landmarks=8192),
        vocabulary_path=str(vocab) if vocab.exists() else None,
    )
    n = 120
    # out-and-back: the return leg revisits the outbound viewpoints → a
    # same-map loop closure fires
    seq = make_sequence(n_frames=n, n_points=1600, cam=CAM, seed=13,
                        motion="outback")
    sess = MonocularSession(cfg)
    recs = sess.process_frames(seq.images, seq.timestamps)
    live_id = sess.tracker.mapctx.map_id
    ok = [f for f in sess.frames if f.state == "OK" and f.map_id == live_id]
    if len(ok) < n // 2:
        pytest.skip(f"marginal scene: only {len(ok)} OK frames")
    if not sess.loops_closed:
        pytest.skip("no loop closure fired on this scene")
    loop_slot = sess.loops_closed[0][0]
    loop_fid = int(np.asarray(sess.tracker.mapctx.map.kf_frame_id[loop_slot]))
    pre = [f for f in ok if f.frame_id < loop_fid - 5]
    assert pre, "no pre-loop frames"
    frozen = np.stack([f.T_cw for f in pre])
    resolved = np.stack(resolve_frame_poses(pre))
    moved = np.abs(resolved - frozen).max(axis=(1, 2))
    assert (moved > 1e-5).any(), (
        "pre-loop frames did not ride the loop correction"
    )
