"""Jitted local-mapping stage (reference LocalMapping.cc, TPU-style).

One call = the work the reference's LocalMapping thread does per keyframe
(SURVEY.md §3.3): triangulate new landmarks against covisible neighbors,
run the windowed Schur BA, cull bad landmarks. Runs as a host-scheduled
stage between tracked frames instead of a free-running thread — the
reference's queue/abort machinery becomes scheduling policy in
models/system.py.

Performance structure: the [K, L] keyframe→landmark indicator (the basis
of covisibility and observation counts) costs one big scatter to build, so
``process_new_keyframe`` builds it ONCE and each stage below both consumes
and incrementally maintains it (``ind`` in/out). The per-pair descriptor
matches ride the fused Pallas matcher (no [N, M] HBM materialization).
The public per-stage wrappers rebuild ``ind`` on demand — same results,
used by the host-sequenced paths and tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.ops import ba, geometry as geo, matching
from orbslamm_tpu.utils.config import SlamConfig


def _fundamental_from_poses(T_a, T_b, K_a, K_b):
    """F such that x_b' F x_a = 0 (pixels), from camera-from-world poses."""
    T_ba = T_b @ geo.T_inv(T_a)
    R, t = T_ba[:3, :3], T_ba[:3, 3]
    E = geo.skew(t) @ R
    return jnp.linalg.inv(K_b).T @ E @ jnp.linalg.inv(K_a)


def _ind_row(obs_row: jax.Array, feat_valid_row: jax.Array, L: int) -> jax.Array:
    """[M] observation row -> [L] indicator row.

    One-hot compare+reduce instead of a scatter: TPU scatters serialize per
    update (~50 ms for 2048 updates on a v5e), the [M,L] compare is sub-ms
    VPU work."""
    obs = jnp.where(feat_valid_row & (obs_row >= 0), obs_row, -1)
    hit = obs[:, None] == jnp.arange(L, dtype=obs.dtype)[None, :]
    return jnp.max(hit, axis=0).astype(jnp.float32)


def _triangulate_pair(cfg: SlamConfig, m: ms.MapState, slot_a, slot_b, max_new: int):
    """Match unassociated features of keyframes a,b along epipolar bands and
    triangulate (reference CreateNewMapPoints, LocalMapping.cc:207).

    Returns (points [max_new,3], ok [max_new], feat_a [max_new], feat_b
    [max_new], desc, normal, dmin, dmax) — fixed-size candidate block.
    """
    T_a, T_b = m.kf_pose[slot_a], m.kf_pose[slot_b]
    K_a, K_b = m.kf_K[slot_a], m.kf_K[slot_b]
    xy_a, xy_b = m.kf_xy[slot_a], m.kf_xy[slot_b]
    lvl_a, lvl_b = m.kf_level[slot_a], m.kf_level[slot_b]
    free_a = m.kf_feat_valid[slot_a] & (m.kf_obs_lm[slot_a] < 0)
    free_b = m.kf_feat_valid[slot_b] & (m.kf_obs_lm[slot_b] < 0)

    F_ab = _fundamental_from_poses(T_a, T_b, K_a, K_b)
    # NOTE: like the reference's SearchForTriangulation (ORBmatcher.cc:659)
    # this applies NO ratio test — the epipolar band (≈2% density) is the
    # selective filter, and the cheirality/parallax/reproj gates below kill
    # the remaining wrong pairs.
    res = matching.match_epipolar(
        m.kf_desc[slot_a],
        m.kf_desc[slot_b],
        free_a,
        free_b,
        F12=F_ab,
        xy_a=xy_a,
        xy_b=xy_b,
        level_a=lvl_a,
        level_b=lvl_b,
        scale=cfg.orb.scale_factor,
        lvl_lo=-2.0,
        lvl_hi=2.0,
        max_dist=float(cfg.matcher.th_high),
        ratio=1.0,
    )
    res = matching.resolve_duplicates(res, xy_b.shape[0])

    P_a = K_a @ T_a[:3, :]
    P_b = K_b @ T_b[:3, :]
    uv_b = xy_b[res.idx]
    X = geo.triangulate_dlt(P_a, P_b, xy_a, uv_b)  # [M,3] world
    pc_a = geo.transform_points(T_a, X)
    pc_b = geo.transform_points(T_b, X)
    # parallax between rays from the two camera centers
    C_a = -T_a[:3, :3].T @ T_a[:3, 3]
    C_b = -T_b[:3, :3].T @ T_b[:3, 3]
    r1 = X - C_a
    r2 = X - C_b
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(d1 * d2, 1e-9)
    e_a = jnp.sum((geo.project(K_a, pc_a) - xy_a) ** 2, -1)
    e_b = jnp.sum((geo.project(K_b, pc_b) - uv_b) ** 2, -1)
    pn = cfg.tracking.pixel_noise
    s2a = (pn * cfg.orb.scale_factor ** lvl_a.astype(jnp.float32)) ** 2
    s2b = (pn * cfg.orb.scale_factor ** lvl_b[res.idx].astype(jnp.float32)) ** 2
    # scale-consistency (reference ratioDist vs ratioOctave, LocalMapping.cc:400)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_oct = (
        cfg.orb.scale_factor ** lvl_a.astype(jnp.float32)
        / cfg.orb.scale_factor ** lvl_b[res.idx].astype(jnp.float32)
    )
    rf = cfg.orb.scale_factor * 1.5
    # baseline/median-scene-depth guard (LocalMapping.cc:255:
    # ratioBaselineDepth < 0.01 → skip the pair): near-zero baselines
    # triangulate arbitrarily wrong depths and blow up the monocular scale.
    baseline = jnp.linalg.norm(C_a - C_b)
    obs_a = m.kf_obs_lm[slot_a]
    lm_z = geo.transform_points(T_a, m.lm_pos[jnp.maximum(obs_a, 0)])[:, 2]
    z_ok = (obs_a >= 0) & m.kf_feat_valid[slot_a]
    zs = jnp.sort(jnp.where(z_ok, lm_z, jnp.inf))
    med_depth = zs[jnp.maximum((z_ok.sum() - 1) // 2, 0)]
    pair_ok = baseline > 0.02 * jnp.where(jnp.isfinite(med_depth), med_depth, 1e9)
    ok = (
        res.ok
        & pair_ok
        & (pc_a[:, 2] > 0.02)
        & (pc_b[:, 2] > 0.02)
        & (cosp < 0.9998)
        & (e_a < 5.991 * s2a)
        & (e_b < 5.991 * s2b)
        & (ratio_dist < ratio_oct * rf)
        & (ratio_dist * rf > ratio_oct)
    )
    # pack the best max_new candidates
    score = jnp.where(ok, -res.dist, -1e9)
    _, pick = jax.lax.top_k(score, max_new)
    okp = ok[pick]
    feat_a = pick.astype(jnp.int32)
    feat_b = res.idx[pick]
    Xp = X[pick]
    desc = m.kf_desc[slot_a][pick]
    # viewing normal: camera→point direction, as in MapPoint::UpdateNormalAndDepth
    normal = (r1 / jnp.maximum(d1[:, None], 1e-9))[pick]
    level_a = lvl_a[pick].astype(jnp.float32)
    dist_a = d1[pick]
    dmax = dist_a * cfg.orb.scale_factor**level_a
    dmin = dmax / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
    return Xp, okp, feat_a, feat_b, desc, normal, dmin, dmax


def _triangulate(cfg, m, kf_slot, ind, n_neighbors: int, max_new: int):
    """Create new landmarks between the new keyframe and its top covisible
    neighbors. Consumes and maintains the [K, L] indicator."""
    W = ms.covisibility(m, ind)
    row = jnp.where(
        m.kf_valid & (jnp.arange(W.shape[0]) != kf_slot), W[kf_slot], -1
    )
    _, nbrs = jax.lax.top_k(row, n_neighbors)
    nbr_ok = row[nbrs] > 0
    L = m.lm_pos.shape[0]

    for i in range(n_neighbors):
        slot_b = nbrs[i]
        X, okp, feat_a, feat_b, desc, normal, dmin, dmax = _triangulate_pair(
            cfg, m, kf_slot, slot_b, max_new
        )
        okp = okp & nbr_ok[i]
        slots = ms.free_lm_slots(m, max_new)
        # don't exceed capacity: a slot that is still valid means pool full
        okp &= ~m.lm_valid[slots]
        m = ms.add_landmarks(m, slots, okp, X, desc, normal, dmin, dmax, kf_slot)
        # write observations into both keyframes (drop masked)
        Mfeat = m.kf_obs_lm.shape[1]
        fa = jnp.where(okp, feat_a, Mfeat)
        fb = jnp.where(okp, feat_b, Mfeat)
        m = m._replace(
            kf_obs_lm=m.kf_obs_lm.at[kf_slot, fa]
            .set(slots, mode="drop")
            .at[slot_b, fb]
            .set(slots, mode="drop")
        )
        # indicator: the new landmark columns light up for both keyframes.
        # A freed slot may carry a stale column from a culled landmark —
        # clear the column first, then set the two new observers.
        col = jnp.where(okp, slots, L)
        ind = ind.at[:, col].set(0.0, mode="drop")
        ind = ind.at[kf_slot, col].set(1.0, mode="drop")
        ind = ind.at[slot_b, col].set(1.0, mode="drop")
    return m, ind


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "close_only"))
def create_depth_landmarks(
    cfg,
    m: ms.MapState,
    kf_slot: jax.Array,
    depth: jax.Array,  # [M] per-feature depth, -1 where unknown
    max_new: int = 256,
    close_only: bool = True,
) -> ms.MapState:
    """Spawn landmarks directly from stereo/RGB-D depth at a new keyframe.

    Reference Tracking::CreateNewKeyFrame (stereo branch): unassociated
    features with depth below mThDepth become map points immediately (plus
    the 100 closest regardless of the cutoff when few are close);
    Tracking::StereoInitialization creates points from ALL positive depths
    (``close_only=False``).
    """
    feat_valid = m.kf_feat_valid[kf_slot]
    obs = m.kf_obs_lm[kf_slot]
    eligible = feat_valid & (obs < 0) & (depth > 0)
    if close_only:
        close = depth < cfg.camera.close_depth
    else:
        close = jnp.ones_like(eligible)
    # closest-first selection (reference sorts vDepthIdx by depth)
    key = jnp.where(eligible, -depth, -jnp.inf)
    _, feat_idx = jax.lax.top_k(key, max_new)
    sel_elig = eligible[feat_idx]
    rank_ok = close[feat_idx] | (jnp.arange(max_new) < 100)
    use = sel_elig & rank_ok

    T = m.kf_pose[kf_slot]
    Kinv = jnp.linalg.inv(m.kf_K[kf_slot])
    uv1 = jnp.concatenate(
        [m.kf_xy[kf_slot][feat_idx], jnp.ones((max_new, 1), jnp.float32)], axis=-1
    )
    Xc = depth[feat_idx][:, None] * (uv1 @ Kinv.T)
    R, t = T[:3, :3], T[:3, 3]
    Xw = (Xc - t) @ R  # R^T (Xc - t)
    center = -R.T @ t
    d_vec = Xw - center
    dist = jnp.linalg.norm(d_vec, axis=-1)
    normal = d_vec / jnp.maximum(dist[:, None], 1e-9)
    lvl = m.kf_level[kf_slot][feat_idx].astype(jnp.float32)
    dmax = dist * cfg.orb.scale_factor**lvl
    dmin = dmax / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
    desc = m.kf_desc[kf_slot][feat_idx]

    slots = ms.free_lm_slots(m, max_new)
    use &= ~m.lm_valid[slots]  # pool full → skip
    m = ms.add_landmarks(m, slots, use, Xw, desc, normal, dmin, dmax, kf_slot)
    # associate the keyframe features with their new landmarks; preserve
    # whatever non-eligible gathered rows already held
    existing = m.kf_obs_lm[kf_slot, feat_idx]
    m = m._replace(
        kf_obs_lm=m.kf_obs_lm.at[kf_slot, feat_idx].set(
            jnp.where(use, slots, existing)
        )
    )
    return m


def _local_ba(cfg, m, kf_slot, ind, window: int, n_fixed: int, iters: int):
    """Windowed Schur BA around the new keyframe (Optimizer.cc:475).

    The top-``window`` covisible keyframes are free; the NEXT ``n_fixed``
    covisible keyframes participate as fixed anchors — the reference's
    "fixed cameras that observe local map points" (Optimizer.cc:522-540),
    which pin the window's gauge (position AND monocular scale) to the rest
    of the map. Without them each local BA lets the window drift.
    """
    Wc = ms.covisibility(m, ind)
    K_pool, Mfeat = m.kf_obs_lm.shape
    total = window + n_fixed
    row = jnp.where(m.kf_valid, Wc[kf_slot], -1).at[kf_slot].set(1 << 30)
    _, win = jax.lax.top_k(row, total)  # includes kf_slot first
    win_ok = (row[win] > 0) & m.kf_valid[win]
    # gauge: boundary anchors + oldest valid window KF + globally-fixed KFs
    oldest = jnp.argmin(jnp.where(win_ok, win, 1 << 30))
    fixed = (
        m.kf_fixed[win]
        | (jnp.arange(total) == oldest)
        | (jnp.arange(total) >= window)
    )
    window = total  # the remainder of the body treats all slots uniformly

    obs_lm = m.kf_obs_lm[win]  # [W,M]
    feat_ok = m.kf_feat_valid[win] & (obs_lm >= 0)
    lm_idx = jnp.where(feat_ok, obs_lm, 0)
    feat_ok &= m.lm_valid[lm_idx]
    obs_cam = jnp.broadcast_to(jnp.arange(window)[:, None], (window, Mfeat))
    sigma2 = (
        cfg.tracking.pixel_noise
        * cfg.orb.scale_factor ** m.kf_level[win].astype(jnp.float32)
    ) ** 2

    # scatter-free window-structured Schur BA (ops/ba.bundle_adjust_window):
    # stereo edges (reference EdgeStereoSE3ProjectXYZ) ride along when the
    # map has stereo measurements
    res = ba.bundle_adjust_window(
        T_cw=m.kf_pose[win],
        K=m.kf_K[win],
        cam_valid=win_ok,
        cam_fixed=fixed,
        points=m.lm_pos,
        point_valid=m.lm_valid,
        obs_point=lm_idx.astype(jnp.int32),
        obs_uv=m.kf_xy[win],
        obs_sigma2=sigma2,
        obs_valid=feat_ok & win_ok[:, None],
        iters=iters,
        obs_ur=m.kf_ur[win] if cfg.camera.bf > 0 else None,
        bf=(
            jnp.full((window,), cfg.camera.bf, jnp.float32)
            if cfg.camera.bf > 0
            else None
        ),
    )
    # write back window poses (drop invalid) and landmark positions
    widx = jnp.where(win_ok & ~fixed, win, K_pool)
    m = m._replace(
        kf_pose=m.kf_pose.at[widx].set(res.T_cw, mode="drop"),
        lm_pos=res.points,
    )
    # remove observations that ended as BA outliers (edge outlier erasure,
    # Optimizer.cc LocalBundleAdjustment outlier removal)
    out = (~res.obs_inlier) & feat_ok
    new_rows = jnp.where(out, -1, m.kf_obs_lm[win])
    new_rows = jnp.where(win_ok[:, None], new_rows, m.kf_obs_lm[win])
    m = m._replace(kf_obs_lm=m.kf_obs_lm.at[win].set(new_rows))
    # indicator: rebuild the touched rows (small per-row scatters)
    L = m.lm_pos.shape[0]
    rows = jax.vmap(lambda o, v: _ind_row(o, v, L))(
        new_rows, m.kf_feat_valid[win]
    ) * (m.kf_valid[win] & win_ok)[:, None].astype(jnp.float32)
    keep = jnp.where(win_ok, win, K_pool)
    ind = ind.at[keep].set(rows, mode="drop")
    return m, ind


def _cull_landmarks(cfg, m, kf_slot, ind):
    """MapPointCulling (LocalMapping.cc:170): drop landmarks with a bad
    found/visible ratio or too few observations soon after creation."""
    obs = ms.lm_obs_count(m, ind)
    ratio = m.lm_found.astype(jnp.float32) / jnp.maximum(m.lm_visible, 1).astype(jnp.float32)
    age = kf_slot.astype(jnp.int32) - m.lm_first_kf
    bad = m.lm_valid & (
        ((ratio < cfg.mapping.culling_found_ratio) & (m.lm_visible >= 8))
        | ((age >= 3) & (obs <= 2))
    )
    m = m._replace(lm_valid=m.lm_valid & ~bad)
    # clear dangling observations
    dangling = (m.kf_obs_lm >= 0) & ~m.lm_valid[jnp.maximum(m.kf_obs_lm, 0)]
    m = m._replace(kf_obs_lm=jnp.where(dangling, -1, m.kf_obs_lm))
    ind = ind * ~bad[None, :]
    return m, ind


def _fuse_into_kf(cfg: SlamConfig, m: ms.MapState, slot: jax.Array, lm_mask: jax.Array):
    """Project the masked landmark set into keyframe ``slot`` and claim
    unassociated features as new observations (reference ORBmatcher::Fuse,
    ORBmatcher.cc:827, via LocalMapping::SearchInNeighbors :454)."""
    T = m.kf_pose[slot]
    K = m.kf_K[slot]
    pc = geo.transform_points(T, m.lm_pos)
    uv = geo.project(K, pc)
    z = pc[..., 2]
    Wpx = 2.0 * K[0, 2]
    Hpx = 2.0 * K[1, 2]
    C = -T[:3, :3].T @ T[:3, 3]
    ray = m.lm_pos - C
    dist = jnp.linalg.norm(ray, axis=-1)
    cosv = jnp.sum(ray * m.lm_normal, -1) / jnp.maximum(dist, 1e-9)
    vis = (
        lm_mask
        & m.lm_valid
        & (z > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < Wpx)
        & (uv[:, 1] >= 0) & (uv[:, 1] < Hpx)
        & (dist >= 0.8 * m.lm_dist_min) & (dist <= 1.2 * m.lm_dist_max)
        & (cosv > 0.5)
    )
    # exclude landmarks already observed by this KF
    L = m.lm_pos.shape[0]
    already = jnp.zeros((L + 1,), bool).at[
        jnp.where(m.kf_obs_lm[slot] >= 0, m.kf_obs_lm[slot], L)
    ].set(True)[:L]
    vis &= ~already

    free = m.kf_feat_valid[slot] & (m.kf_obs_lm[slot] < 0)
    pred_level = jnp.clip(
        jnp.floor(
            jnp.log(jnp.maximum(m.lm_dist_max / jnp.maximum(dist, 1e-6), 1e-6))
            / jnp.log(cfg.orb.scale_factor)
        ),
        0,
        cfg.orb.n_levels - 1,
    )
    radius = 3.0 * cfg.orb.scale_factor**pred_level
    # level band: feat.level - pred_level in [-1, 2]  ⇔  lb - la in [-2, 1]
    res = matching.match_windowed(
        m.kf_desc[slot],
        m.lm_desc,
        free,
        vis,
        xy_a=m.kf_xy[slot],
        xy_b=uv,
        radius_b=radius,
        level_a=m.kf_level[slot],
        level_b=pred_level,
        lvl_lo=-2.0,
        lvl_hi=1.0,
        max_dist=float(cfg.matcher.th_low),
        ratio=1.0,
    )
    res = matching.resolve_duplicates(res, L)
    new_obs = jnp.where(res.ok, res.idx, m.kf_obs_lm[slot])
    return m._replace(kf_obs_lm=m.kf_obs_lm.at[slot].set(new_obs))


def _fuse(cfg, m, kf_slot, ind, n_neighbors: int):
    """SearchInNeighbors (LocalMapping.cc:454): cross-pollinate observations
    between the new keyframe and its covisible neighborhood, raising obs
    counts so fresh landmarks survive culling and BA gets more constraints."""
    W = ms.covisibility(m, ind)
    row = jnp.where(
        m.kf_valid & (jnp.arange(W.shape[0]) != kf_slot), W[kf_slot], -1
    )
    _, nbrs = jax.lax.top_k(row, n_neighbors)
    nbr_ok = row[nbrs] > 0
    L = m.lm_pos.shape[0]
    # landmarks seen by the new KF
    own = jnp.zeros((L + 1,), bool).at[
        jnp.where(m.kf_obs_lm[kf_slot] >= 0, m.kf_obs_lm[kf_slot], L)
    ].set(True)[:L]
    touched = [kf_slot]
    for i in range(n_neighbors):
        # project new KF's landmarks into neighbor i (skip invalid neighbors
        # by masking the landmark set to empty)
        m = _fuse_into_kf(cfg, m, nbrs[i], own & nbr_ok[i])
        touched.append(nbrs[i])
    # symmetric: project ALL map landmarks into the new keyframe
    m = _fuse_into_kf(cfg, m, kf_slot, jnp.ones((L,), bool))
    # indicator: rebuild the touched rows
    for s in touched:
        row_i = _ind_row(m.kf_obs_lm[s], m.kf_feat_valid[s], L)
        ind = ind.at[s].set(row_i * m.kf_valid[s].astype(jnp.float32))
    return m, ind


def _cull_keyframes(cfg, m, kf_slot, ind, n_check: int):
    """KeyFrameCulling (LocalMapping.cc:632): invalidate covisible keyframes
    whose landmarks are ≥90% observed by at least 3 other keyframes. The
    origin (fixed) and newest keyframes are never culled; ORBSLAMM also
    protects each map's first keyframe (mbOtherMapFirst, KeyFrame.h:109)."""
    W = ms.covisibility(m, ind)
    obs_count = ms.lm_obs_count(m, ind)
    row = jnp.where(
        m.kf_valid & (jnp.arange(W.shape[0]) != kf_slot), W[kf_slot], -1
    )
    _, cands = jax.lax.top_k(row, n_check)

    def redundancy(slot):
        obs = m.kf_obs_lm[slot]
        has = m.kf_feat_valid[slot] & (obs >= 0)
        lm = jnp.maximum(obs, 0)
        has &= m.lm_valid[lm]
        redundant = has & (obs_count[lm] >= 5)  # seen by >= 4 OTHER keyframes
        # (stricter than the reference's 3: our fuse step raises obs counts
        # aggressively, and we lack the same-or-finer-scale filter — without
        # this margin culling removes load-bearing keyframes)
        total = jnp.maximum(has.sum(), 1)
        return redundant.sum().astype(jnp.float32) / total.astype(jnp.float32), has.sum()

    kf_valid = m.kf_valid
    for i in range(n_check):
        slot = cands[i]
        ratio, n_obs = redundancy(slot)
        cull = (
            (row[cands[i]] > 0)
            & kf_valid[slot]
            & ~m.kf_fixed[slot]
            & (slot != kf_slot)
            & (slot != 0)
            & (ratio > cfg.mapping.kf_culling_redundancy)
            & (n_obs > 40)
        )
        kf_valid = kf_valid.at[slot].set(jnp.where(cull, False, kf_valid[slot]))
    m = m._replace(kf_valid=kf_valid)
    # culled keyframes' observations no longer count
    dangling = ~kf_valid[:, None] & (m.kf_obs_lm >= 0)
    m = m._replace(kf_obs_lm=jnp.where(dangling, -1, m.kf_obs_lm))
    ind = ind * kf_valid[:, None].astype(jnp.float32)
    return m, ind


def process_new_keyframe(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_slot: jax.Array,
    n_neighbors: int = 2,
    max_new: int = 256,
    fuse_neighbors_n: int = 4,
    ba_window: int = 12,
    ba_fixed: int = 8,
    ba_iters: int = 8,
    cull_check: int = 6,
    ind: jax.Array | None = None,
) -> ms.MapState:
    """The full per-keyframe mapping pipeline with the indicator built once
    and threaded through all stages (the fused-step insert path)."""
    m, _ = process_new_keyframe_cached(
        cfg, m, kf_slot, ms.lm_indicator(m) if ind is None else ind,
        n_neighbors=n_neighbors, max_new=max_new,
        fuse_neighbors_n=fuse_neighbors_n, ba_window=ba_window,
        ba_fixed=ba_fixed, ba_iters=ba_iters, cull_check=cull_check,
    )
    return m


def process_new_keyframe_cached(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_slot: jax.Array,
    ind: jax.Array,
    n_neighbors: int = 2,
    max_new: int = 256,
    fuse_neighbors_n: int = 4,
    ba_window: int = 12,
    ba_fixed: int = 8,
    ba_iters: int = 8,
    cull_check: int = 6,
):
    """process_new_keyframe with a CARRIED [K,L] observation indicator.

    The full lm_indicator rebuild is a large scatter (~56 ms on a v5e at
    128x8192); between keyframes only counters change, so the fused chunk
    step carries the indicator and this path just refreshes the inserted
    keyframe's row. Returns (map, indicator)."""
    ind = ms.refresh_indicator_row(m, ind, kf_slot)
    m, ind = _triangulate(cfg, m, kf_slot, ind, n_neighbors, max_new)
    m, ind = _fuse(cfg, m, kf_slot, ind, fuse_neighbors_n)
    m, ind = _local_ba(cfg, m, kf_slot, ind, ba_window, ba_fixed, ba_iters)
    m, ind = _cull_landmarks(cfg, m, kf_slot, ind)
    m, ind = _cull_keyframes(cfg, m, kf_slot, ind, cull_check)
    return m, ind


# ---------------------------------------------------------------------------
# Public per-stage wrappers (host-sequenced path + tests)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "n_neighbors", "max_new"))
def triangulate_new_landmarks(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_slot: jax.Array,
    n_neighbors: int = 2,
    max_new: int = 256,
) -> ms.MapState:
    m, _ = _triangulate(cfg, m, kf_slot, ms.lm_indicator(m), n_neighbors, max_new)
    return m


@functools.partial(
    jax.jit, static_argnames=("cfg", "window", "n_fixed", "iters")
)
def local_bundle_adjustment(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_slot: jax.Array,
    window: int = 12,
    n_fixed: int = 8,
    iters: int = 8,
) -> ms.MapState:
    m, _ = _local_ba(cfg, m, kf_slot, ms.lm_indicator(m), window, n_fixed, iters)
    return m


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_landmarks(cfg: SlamConfig, m: ms.MapState, kf_slot: jax.Array) -> ms.MapState:
    m, _ = _cull_landmarks(cfg, m, kf_slot, ms.lm_indicator(m))
    return m


@functools.partial(jax.jit, static_argnames=("cfg", "n_neighbors"))
def fuse_neighbors(
    cfg: SlamConfig, m: ms.MapState, kf_slot: jax.Array, n_neighbors: int = 4
) -> ms.MapState:
    m, _ = _fuse(cfg, m, kf_slot, ms.lm_indicator(m), n_neighbors)
    return m


@functools.partial(jax.jit, static_argnames=("cfg", "n_check"))
def cull_keyframes(
    cfg: SlamConfig, m: ms.MapState, kf_slot: jax.Array, n_check: int = 6
) -> ms.MapState:
    m, _ = _cull_keyframes(cfg, m, kf_slot, ms.lm_indicator(m), n_check)
    return m
