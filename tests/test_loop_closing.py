"""Map-level loop-closing tests on a fabricated drifted map.

Construction: a ring trajectory split into segment A (clean, at ground
truth) and segment B (warped by an accumulating Sim3 drift, observing its
OWN drifted copies of the scene points — internally consistent, globally
wrong). The last B keyframe revisits the first A viewpoint. Loop closing
must: retrieve an A-side candidate via BoW, recover the drift Sim3 from the
3D-3D matches (including its scale), and pull segment B back onto A via the
essential-graph optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.io.synthetic import fabricate_map
from orbslamm_tpu.models import loop_closing as lc, map_state as ms
from orbslamm_tpu.ops import bow, geometry as geo
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

CFG = SlamConfig(
    camera=CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120),
    orb=OrbConfig(n_features=300, max_keypoints=512, n_levels=4),
    capacity=CapacityConfig(max_keyframes=32, max_landmarks=4096),
    tracking=TrackingConfig(pixel_noise=1.0),
)


def build_drifted_ring(n_kf=16, n_split=11, drift_scale=1.12, seed=0):
    """Returns (MapState, T_gt [K,4,4], drift sim3 D applied to segment B)."""
    rng = np.random.default_rng(seed)
    # ring of keyframes looking outward
    T_gt = np.zeros((n_kf, 4, 4), np.float32)
    for i in range(n_kf):
        ang = 2 * np.pi * i / n_kf
        Rwc = np.asarray(geo.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        C = np.array([3.0 * np.sin(ang), 0.0, -3.0 * np.cos(ang)], np.float32)
        R = Rwc.T
        T_gt[i, :3, :3] = R
        T_gt[i, :3, 3] = -R @ C
        T_gt[i, 3, 3] = 1
    # scene: points on a cylinder around the ring (radius 10)
    n_pts = 1200
    ang_p = rng.uniform(0, 2 * np.pi, n_pts)
    pts = np.stack(
        [10.0 * np.sin(ang_p), rng.uniform(-3, 3, n_pts), -10.0 * np.cos(ang_p)], -1
    ).astype(np.float32)
    desc = rng.integers(0, 256, (n_pts, 32), dtype=np.uint8)

    # segment B observes drifted COPIES of the points it can see
    D = geo.sim3_make(
        jnp.float32(drift_scale),
        geo.so3_exp(jnp.asarray([0.01, 0.05, -0.02], jnp.float32)),
        jnp.asarray([0.4, 0.1, -0.3], jnp.float32),
    )
    pts_b = np.asarray(geo.sim3_apply(D, jnp.asarray(pts)))
    # drifted B poses: x_cam = T_gt x_w = T_gt ∘ S_D^-1 (x_w_drifted)
    S_inv = geo.sim3_inv(D)

    def warp_pose(T):
        S_Tw = geo.sim3_compose(geo.sim3_from_se3(jnp.asarray(T)), S_inv)
        return np.asarray(geo.sim3_to_se3(S_Tw))

    all_pts = np.concatenate([pts, pts_b.astype(np.float32)])
    all_desc = np.concatenate([desc, desc])  # same appearance for copies
    poses = T_gt.copy()
    for i in range(n_split, n_kf):
        poses[i] = warp_pose(T_gt[i])
    mask = np.zeros((n_kf, 2 * n_pts), bool)
    mask[:n_split, :n_pts] = True
    mask[n_split:, n_pts:] = True
    refs = np.concatenate(
        [np.zeros(n_pts, np.int32), np.full(n_pts, n_split, np.int32)]
    )
    m, lm_slot = fabricate_map(
        CFG, poses, all_pts, all_desc, kf_point_mask=mask, seed=seed,
        point_ref_kf=refs,
    )
    return m, T_gt, D


def kf_pose_err(m, T_gt):
    errs = []
    kv = np.asarray(m.kf_valid)
    for i in np.nonzero(kv)[0]:
        Te = np.asarray(m.kf_pose[i])
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -T_gt[i, :3, :3].T @ T_gt[i, :3, 3]
        errs.append(np.linalg.norm(Ce - Cg))
    return np.array(errs)


@pytest.fixture(scope="module")
def drifted():
    return build_drifted_ring()


def test_loop_candidate_retrieval(drifted):
    m, T_gt, D = drifted
    # vocabulary from the map's own descriptors
    kv = np.asarray(m.kf_valid)
    descs = np.concatenate(
        [np.asarray(m.kf_desc[s])[np.asarray(m.kf_feat_valid[s])] for s in np.nonzero(kv)[0]]
    )
    voc = bow.build_vocabulary(descs, branching=8, depth=3, iters=5)
    K_cap = m.kf_pose.shape[0]
    kf_bow = jnp.zeros((K_cap, voc.n_words), jnp.float32)
    for s in np.nonzero(kv)[0]:
        words = bow.assign_words(voc, m.kf_desc[s], m.kf_feat_valid[s])
        kf_bow = kf_bow.at[s].set(bow.bow_vector(voc, words))
    slot = jnp.int32(15)  # last B keyframe, revisiting the start
    scores, allowed, min_score = lc.loop_candidates(CFG, m, kf_bow, slot, min_gap=3)
    sc = np.asarray(jnp.where(allowed, scores, -1.0))
    best = int(sc.argmax())
    assert best <= 2, f"candidate {best} (expected an early-A keyframe)"
    assert sc[best] > float(min_score)


def test_loop_sim3_recovers_drift(drifted):
    m, T_gt, D = drifted
    ls = lc.compute_loop_sim3(CFG, m, jnp.int32(15), jnp.int32(0), jax.random.key(0))
    assert bool(ls.success), f"sim3 failed, inliers {int(ls.n_inliers)}"
    assert int(ls.n_inliers) >= 20
    # The recovered S_ba maps KF15-camera coords to KF0-camera coords. Its
    # scale must equal the drift scale (B world is drift_scale x larger).
    s, R, t = geo.sim3_parts(ls.S_ba)
    assert abs(float(s) - 1.0 / 1.12) < 0.02, f"scale {float(s)}"


def test_correct_loop_pulls_segment_back(drifted):
    m, T_gt, D = drifted
    err_before = kf_pose_err(m, T_gt)
    assert err_before[11:].max() > 0.25  # drift present on segment B
    ls = lc.compute_loop_sim3(CFG, m, jnp.int32(15), jnp.int32(0), jax.random.key(0))
    m2 = lc.correct_loop(CFG, m, jnp.int32(15), jnp.int32(0), ls.S_ba)
    err_after = kf_pose_err(m2, T_gt)
    assert err_after[11:].max() < err_before[11:].max() * 0.5, (
        f"B errors {err_before[11:]} -> {err_after[11:]}"
    )
    # A segment stays put
    assert err_after[:11].max() < 0.15
    # landmarks follow their reference keyframes: mean reprojection residual
    # in the corrected keyframes stays small
    from orbslamm_tpu.ops import geometry as geo2
    slot = 13
    obs = np.asarray(m2.kf_obs_lm[slot])
    fv = np.asarray(m2.kf_feat_valid[slot]) & (obs >= 0)
    pts = np.asarray(m2.lm_pos)[obs[fv]]
    T = np.asarray(m2.kf_pose[slot])
    pc = pts @ T[:3, :3].T + T[:3, 3]
    K = np.asarray(m2.kf_K[slot])
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    res = np.linalg.norm(uv - np.asarray(m2.kf_xy[slot])[fv], axis=1)
    assert np.median(res) < 3.0, f"median reproj after correction {np.median(res)}"


@pytest.mark.slow
def test_no_false_closure_under_aliasing():
    """Loop-closure PRECISION under perceptual aliasing: a long trajectory
    with only ~20 unique textures repeated over every landmark (the
    repeated-facade problem) and NO revisit must close no loop — the
    covisibility-consistency chain + group scoring + Sim3 verification
    (LoopClosing.cc:158-217, KeyFrameDatabase.cc:129-200) must reject the
    high-but-wrong BoW candidates aliasing produces."""
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.models.system import MonocularSession

    cfg = SlamConfig(
        camera=CFG.camera,
        orb=OrbConfig(n_features=400, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55, init_min_triangulated=30,
            init_min_parallax_deg=0.4,
        ),
    )
    seq = make_sequence(n_frames=72, n_points=1000, cam=cfg.camera, seed=5,
                        motion="strafe", stamp_pool=60)
    sess = MonocularSession(cfg)
    recs = sess.process_frames(seq.images, seq.timestamps)
    n_ok = sum(1 for r in recs if r.state == "OK")
    assert n_ok > 30, f"aliased scene barely tracked ({n_ok} OK frames)"
    assert sess.loops_closed == [], (
        f"false loop closure(s) under aliasing: {sess.loops_closed}"
    )


def test_loop_edges_persist_and_constrain():
    """Persistent loop edges (KeyFrame::AddLoopEdge, Optimizer.cc:1126-1139):
    each correct_loop records its seam in the map's loop-edge table, and a
    LATER correction's essential graph includes the earlier edges so it
    cannot re-break the first seam."""
    m, T_gt, D = build_drifted_ring()
    # first closure: last keyframe against its ground-truth neighbor
    slot_a, slot_b = 15, 0
    key = jax.random.key(3)
    ls = lc.compute_loop_sim3(CFG, m, jnp.int32(slot_a), jnp.int32(slot_b), key)
    assert bool(ls.success)
    m1 = lc.correct_loop(CFG, m, jnp.int32(slot_a), jnp.int32(slot_b), ls.S_ba)
    le1 = np.asarray(m1.loop_edges)
    assert (le1[0] == [slot_a, slot_b]).all(), le1[:3]
    assert (le1[1:, 0] == -1).all()
    # seam quality after the first correction: relative pose across the seam
    # matches ground truth

    def seam_err(mm_):
        Ta = np.asarray(mm_.kf_pose[slot_a])
        Tb = np.asarray(mm_.kf_pose[slot_b])
        rel = Ta @ np.linalg.inv(Tb)
        rel_gt = T_gt[slot_a] @ np.linalg.inv(T_gt[slot_b])
        dt = np.linalg.norm(rel[:3, 3] - rel_gt[:3, 3])
        return dt

    err1 = seam_err(m1)
    # second closure at a different seam (mid-ring): the first loop edge must
    # keep constraining the graph
    ls2 = lc.compute_loop_sim3(CFG, m1, jnp.int32(12), jnp.int32(9),
                               jax.random.key(5))
    if bool(ls2.success):
        m2 = lc.correct_loop(CFG, m1, jnp.int32(12), jnp.int32(9), ls2.S_ba)
    else:
        # identity seam (already consistent) exercises the same path.
        # correct_loop's convention: S_ba maps a-frame to b-frame
        # (S_aw_corr = S_ba^-1 ∘ S_bw), so the consistent measurement is
        # S_bw ∘ S_aw^-1 with a=12, b=9
        m2 = lc.correct_loop(
            CFG, m1, jnp.int32(12), jnp.int32(9),
            geo.sim3_from_se3(
                jnp.asarray(np.asarray(m1.kf_pose[9])
                            @ np.linalg.inv(np.asarray(m1.kf_pose[12])))
            ),
        )
    le2 = np.asarray(m2.loop_edges)
    assert (le2[0] == [slot_a, slot_b]).all()
    assert (le2[1] == [12, 9]).all()
    err2 = seam_err(m2)
    # the second correction must not re-open the first seam
    assert err2 < max(2.0 * err1, 0.15), f"seam re-broken: {err1} -> {err2}"


def test_relocalization_group_recall_under_aliasing():
    """Reloc with KFDB-rigor group accumulation (KeyFrameDatabase.cc:202-312):
    a lost frame at a revisited viewpoint relocalizes against the right
    PLACE even when single-keyframe scores alias."""
    from orbslamm_tpu.models.system import MapContext, RobotTracker, TrackingState
    from orbslamm_tpu.io.synthetic import make_sequence

    cam = CFG.camera
    # the feature/scene density the multimap kidnap tests track stably with
    # (CFG's 300-feature config loses tracking mid-strafe before the kidnap)
    cfg = CFG.replace(
        vocabulary_path=None,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55, init_min_triangulated=30,
            init_min_parallax_deg=0.4,
        ),
        multi_mapping=False,  # lost → relocalize (Tracking.cc:1404)
    )
    seq = make_sequence(n_frames=70, n_points=1400, cam=cam, seed=7,
                        motion="strafe", kidnap_at=40, return_at=50)
    mc = MapContext(cfg)
    t = RobotTracker(cfg, mc, "reloc")
    # the gentle strafe inserts only a couple of keyframes before the
    # kidnap; without this the early-loss young-map reset (Tracking.cc:520)
    # discards the map instead of exercising relocalization
    t.auto_reset_young = False
    for i in range(40):
        t.process_frame(seq.images[i], float(seq.timestamps[i]))
    assert t.state == TrackingState.OK
    mc.ensure_vocabulary()
    # kidnap: frames 40..49 are elsewhere -> loss; 50+ revisit the start
    states = []
    for i in range(40, 70):
        states.append(t.process_frame(seq.images[i], float(seq.timestamps[i])).state)
    assert "LOST" in states, states
    assert states[-1] == "OK", f"no relocalization: {states}"
