"""Multi-map / multi-robot tests: the ORBSLAMM signature behaviors.

1. Map-level merge: two fabricated maps that observe an overlapping region
   (map B in its own Sim3-warped world — a different scale/orientation, as
   two independently-initialized monocular maps always are). The merge must
   recover the inter-map Sim3, transplant B into A's pools, and produce one
   globally consistent map.
2. Session-level kidnap: a robot losing tracking mid-sequence must keep its
   orphan map and continue mapping into a brand-new map (Tracking.cc:330).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.io.synthetic import fabricate_map, make_sequence
from orbslamm_tpu.models import loop_closing as lc
from orbslamm_tpu.models.multimap import MultiMapper, merge_maps
from orbslamm_tpu.models.system import MapContext
from orbslamm_tpu.ops import geometry as geo
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

CFG = SlamConfig(
    camera=CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120),
    orb=OrbConfig(n_features=300, max_keypoints=512, n_levels=4),
    capacity=CapacityConfig(max_keyframes=32, max_landmarks=4096),
    tracking=TrackingConfig(pixel_noise=1.0),
)


def build_two_overlapping_maps(n_a=8, n_b=8, seed=0):
    """Map A covers ring sector [0, n_a); map B covers [n_a-2, n_a-2+n_b)
    (2 overlapping views), in B's OWN warped world."""
    rng = np.random.default_rng(seed)
    n_total = n_a + n_b
    T_gt = np.zeros((n_total, 4, 4), np.float32)
    for i in range(n_total):
        ang = 2 * np.pi * i / 20
        Rwc = np.asarray(geo.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        C = np.array([3.0 * np.sin(ang), 0.0, -3.0 * np.cos(ang)], np.float32)
        T_gt[i, :3, :3] = Rwc.T
        T_gt[i, :3, 3] = -Rwc.T @ C
        T_gt[i, 3, 3] = 1
    n_pts = 1500
    ang_p = rng.uniform(-0.5, 2 * np.pi * n_total / 20 + 0.5, n_pts)
    pts = np.stack(
        [10 * np.sin(ang_p), rng.uniform(-3, 3, n_pts), -10 * np.cos(ang_p)], -1
    ).astype(np.float32)
    desc = rng.integers(0, 256, (n_pts, 32), dtype=np.uint8)

    # map A: GT world
    mA, _ = fabricate_map(CFG, T_gt[:n_a], pts, desc, seed=seed)

    # map B: same scene but its own world, warped by Sim3 D (scale+rot+trans)
    D = geo.sim3_make(
        jnp.float32(0.55),
        geo.so3_exp(jnp.asarray([0.05, -0.3, 0.1], jnp.float32)),
        jnp.asarray([1.0, -0.5, 2.0], jnp.float32),
    )
    pts_b = np.asarray(geo.sim3_apply(D, jnp.asarray(pts)))
    S_inv = geo.sim3_inv(D)
    poses_b = np.stack(
        [
            np.asarray(geo.sim3_to_se3(geo.sim3_compose(geo.sim3_from_se3(jnp.asarray(T)), S_inv)))
            for T in T_gt[n_a - 2 : n_a - 2 + n_b]
        ]
    )
    mB, _ = fabricate_map(CFG, poses_b, pts_b.astype(np.float32), desc, seed=seed + 1)
    return mA, mB, T_gt, D, n_a, n_b


@pytest.fixture(scope="module")
def two_maps():
    return build_two_overlapping_maps()


def test_cross_map_sim3(two_maps):
    mA, mB, T_gt, D, n_a, n_b = two_maps
    # B keyframe 0 ↔ A keyframe n_a-2 view the same place
    ls = lc.compute_loop_sim3_cross(
        CFG, mB, mA, jnp.int32(0), jnp.int32(n_a - 2), jax.random.key(0)
    )
    assert bool(ls.success), f"inliers {int(ls.n_inliers)}"
    # the camera-frame sim3 scale must equal 1/scale(D) (B world is 0.55x)
    s, _, _ = geo.sim3_parts(ls.S_ba)
    assert abs(float(s) - 1.0 / 0.55) < 0.05, f"scale {float(s)}"


def test_merge_maps_produces_consistent_map(two_maps):
    mA, mB, T_gt, D, n_a, n_b = two_maps
    ls = lc.compute_loop_sim3_cross(
        CFG, mB, mA, jnp.int32(0), jnp.int32(n_a - 2), jax.random.key(0)
    )
    res = merge_maps(
        CFG, mA, mB, ls.S_ba, jnp.int32(0), jnp.int32(n_a - 2), jnp.int32(n_a)
    )
    merged = res.map
    assert int(merged.kf_valid.sum()) == n_a + n_b
    # every merged keyframe pose must match ground truth (B slots shifted)
    errs = []
    for i in range(n_a + n_b):
        gt_idx = i if i < n_a else (i - n_a) + (n_a - 2)
        Te = np.asarray(merged.kf_pose[i])
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -T_gt[gt_idx, :3, :3].T @ T_gt[gt_idx, :3, 3]
        errs.append(np.linalg.norm(Ce - Cg))
    errs = np.array(errs)
    assert errs.max() < 0.15, f"merged pose errors {errs}"
    # observations remap into valid landmarks
    obs = np.asarray(merged.kf_obs_lm[n_a])  # first absorbed KF
    fv = np.asarray(merged.kf_feat_valid[n_a]) & (obs >= 0)
    assert fv.sum() > 50
    assert np.asarray(merged.lm_valid)[obs[fv]].all()
    # reprojection consistency in an absorbed keyframe
    pts = np.asarray(merged.lm_pos)[obs[fv]]
    T = np.asarray(merged.kf_pose[n_a])
    pc = pts @ T[:3, :3].T + T[:3, 3]
    K = np.asarray(merged.kf_K[n_a])
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    r = np.linalg.norm(uv - np.asarray(merged.kf_xy[n_a])[fv], axis=1)
    assert np.median(r) < 3.0, f"median reproj {np.median(r)}"


def test_merge_into_tight_pool_evicts_by_value(two_maps):
    """Merge capacity honesty (VERDICT r4 #8): when the base map's landmark
    pool cannot hold the absorbed map's landmarks, the WORST base landmarks
    (lowest found ratio) are evicted — counted, their observations cleared
    — instead of the absorbed map's being silently dropped."""
    import dataclasses

    mA, mB, T_gt, D, n_a, n_b = two_maps
    L = int(mA.lm_valid.shape[0])
    nA_valid = int(np.asarray(mA.lm_valid).sum())
    nB_valid = int(np.asarray(mB.lm_valid).sum())
    # tighten the pool: fill A's free slots with filler landmarks so that
    # free < nB_valid. Give fillers a POOR found ratio except a protected
    # well-observed subset.
    free = np.nonzero(~np.asarray(mA.lm_valid))[0]
    need = max(0, nB_valid - 64)  # leave only 64 free slots
    fill = free[: len(free) - 64] if len(free) > 64 else free
    lm_valid = np.asarray(mA.lm_valid).copy()
    lm_valid[fill] = True
    vis = np.asarray(mA.lm_visible).copy()
    fnd = np.asarray(mA.lm_found).copy()
    vis[fill] = 10
    fnd[fill] = 1  # found ratio 0.1 — prime eviction candidates
    # the ORIGINAL map landmarks look well-tracked
    orig = np.nonzero(np.asarray(mA.lm_valid))[0]
    vis[orig] = 10
    fnd[orig] = 9
    mA2 = mA._replace(
        lm_valid=jnp.asarray(lm_valid),
        lm_visible=jnp.asarray(vis),
        lm_found=jnp.asarray(fnd),
    )
    ls = lc.compute_loop_sim3_cross(
        CFG, mB, mA2, jnp.int32(0), jnp.int32(n_a - 2), jax.random.key(0)
    )
    res = merge_maps(
        CFG, mA2, mB, ls.S_ba, jnp.int32(0), jnp.int32(n_a - 2), jnp.int32(n_a)
    )
    n_evicted = int(res.n_evicted)
    assert n_evicted > 0, "tight pool must evict"
    # every valid B landmark was placed (none silently dropped)
    remap = np.asarray(res.lm_remap)
    bvalid = np.asarray(mB.lm_valid)
    assert (remap[bvalid] >= 0).all(), "absorbed landmarks were dropped"
    # evictions came from the poor-ratio fillers, not the well-tracked set
    merged_valid = np.asarray(res.map.lm_valid)
    placed = set(remap[bvalid].tolist())
    surviving_orig = [i for i in orig if merged_valid[i] or i in placed]
    assert len(surviving_orig) >= int(0.9 * len(orig)), (
        "well-tracked landmarks were evicted before poor ones"
    )
    # no keyframe observation dangles onto an evicted/overwritten slot with
    # stale geometry: all observations point at valid landmarks
    obs = np.asarray(res.map.kf_obs_lm)
    valid_obs = obs >= 0
    assert merged_valid[obs[valid_obs]].all()


@pytest.mark.slow
def test_kidnap_creates_new_map():
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55,
            init_min_triangulated=30, init_min_parallax_deg=0.4,
        ),
    )
    seq = make_sequence(n_frames=60, n_points=1400, cam=cam, seed=7, kidnap_at=30)
    mm = MultiMapper(cfg)
    t = mm.add_robot("r0")
    states = []
    for i in range(len(seq.images)):
        rec = mm.process_frame(0, seq.images[i], float(seq.timestamps[i]))
        states.append(rec.state)
    # the kidnap produced a tracking loss and a NEW map; both maps kept
    assert "LOST" in states
    live = mm.live_maps()
    assert len(live) >= 2, f"maps: {[m.summary() for m in mm.maps]}"
    grown = [m for m in live if m.n_kf >= 2]
    assert len(grown) >= 2, f"both maps should have keyframes: {[m.n_kf for m in live]}"
    # tracking recovered after the kidnap
    assert states[-1] == "OK" or states[-2] == "OK"


@pytest.mark.slow
def test_kidnap_and_return_merges_maps():
    """The fr2_360_kidnap scenario end-to-end (BASELINE config #2): kidnap →
    tracking loss → NEW map; return to the start → MultiMapper detects the
    overlap and merges the maps (Tracking.cc:330 + MultiMapper.cc:82)."""
    from orbslamm_tpu.eval.ate import ate_from_poses

    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=96, max_landmarks=8192),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55,
            init_min_triangulated=30, init_min_parallax_deg=0.4,
        ),
    )
    seq = make_sequence(n_frames=100, n_points=1400, cam=cam, seed=7,
                        kidnap_at=40, return_at=70)
    mm = MultiMapper(cfg)
    mm.add_robot("r0")
    for i in range(100):
        mm.process_frame(0, seq.images[i], float(seq.timestamps[i]))
    mm.flush_merge_scans()  # drain the deferred scan pipeline
    assert len(mm.merges) >= 1, f"no merge happened: {mm.summary()}"
    # the merged (base) map spans both the original and the kidnap region
    base = next(m for m in mm.maps if m.map_id == mm.merges[0][1])
    assert base.merged_into is None
    assert base.n_kf >= 18, base.summary()
    # merged keyframes stay geometrically consistent with ground truth
    kv = np.asarray(base.map.kf_valid)
    fids = np.asarray(base.map.kf_frame_id)[kv]
    est = np.asarray(base.map.kf_pose)[kv]
    ate = ate_from_poses(est, seq.poses_cw[fids])
    assert ate < 0.6, f"merged-map ATE {ate}"
