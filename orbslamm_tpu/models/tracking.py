"""Jitted tracking stages (the reference Tracking.cc front end, TPU-style).

Each stage is a pure function over (MapState, Features, poses); the host
state machine (models/system.py) sequences them. Key re-designs vs the
reference:

  * TrackWithMotionModel (Tracking.cc:917): last frame's landmarks are
    projected with the constant-velocity pose and matched in windows — one
    masked Hamming matmul + pose_optimize.
  * TrackLocalMap (Tracking.cc:980 + SearchLocalPoints :1206): instead of
    walking the covisibility graph to build a local point set, we project
    the ENTIRE landmark pool (cheap, batched), frustum/scale-mask it, take
    the nearest candidates, and match. The frustum-visible subset IS the
    local map.
  * Scale prediction (MapPoint::PredictScale, MapPoint.cc:385): distance
    band → octave hint → per-candidate search radius and level window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.models.map_state import MapState
from orbslamm_tpu.ops import ba, geometry as geo, matching
from orbslamm_tpu.ops.orb import Features
from orbslamm_tpu.utils.config import SlamConfig


class TrackResult(NamedTuple):
    T_cw: jax.Array  # [4,4] optimized pose
    feat_lm: jax.Array  # [M] int32 — landmark id per current feature (-1 none)
    n_matches: jax.Array  # int32 matches fed to the optimizer
    n_inliers: jax.Array  # int32 surviving inliers


def _sigma2(level, scale: float, pixel_noise: float = 1.0):
    return (pixel_noise * scale ** level.astype(jnp.float32)) ** 2


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_motion_model(
    cfg: SlamConfig,
    m: MapState,
    feats: Features,
    T_pred: jax.Array,
    K: jax.Array,
    last_feats: Features,
    last_lm: jax.Array,
    T_last: jax.Array | None = None,
) -> TrackResult:
    """Project last frame's landmarks at the predicted pose and match."""
    if T_last is None:
        T_last = T_pred
    L = m.lm_pos.shape[0]
    has_lm = last_feats.valid & (last_lm >= 0)
    lm_idx = jnp.where(has_lm, last_lm, 0)
    pos = m.lm_pos[lm_idx]
    alive = has_lm & m.lm_valid[lm_idx]
    pc = geo.transform_points(T_pred, pos)
    uv = geo.project(K, pc)
    vis = alive & (pc[..., 2] > 0.1)
    radius = cfg.tracking.search_radius_motion * (
        cfg.orb.scale_factor ** last_feats.level.astype(jnp.float32)
    )
    # per-CANDIDATE (column) radius: window depends on the landmark's octave
    res = matching.match_windowed(
        feats.desc,
        last_feats.desc,
        feats.valid,
        vis,
        xy_a=feats.xy,
        xy_b=uv,
        radius_b=radius,
        level_a=feats.level,
        level_b=last_feats.level,
        lvl_lo=-1.0,
        lvl_hi=1.0,
        max_dist=float(cfg.matcher.th_high),
        ratio=cfg.matcher.nn_ratio_tracking,
        angles_a=feats.angle,
        angles_b=last_feats.angle,
    )
    res = matching.resolve_duplicates(res, last_feats.valid.shape[0])
    feat_lm = jnp.where(res.ok, last_lm[res.idx], -1)
    # pose optimization over matched landmarks. The robust cost has
    # init-dependent basins when translation is weakly observable (low
    # parallax per frame); optimizing from BOTH the constant-velocity
    # prediction and the last pose and keeping the better basin breaks the
    # velocity-runaway feedback loop.
    lm_of_feat = jnp.where(feat_lm >= 0, feat_lm, 0)
    pos_f = m.lm_pos[lm_of_feat]
    use = feat_lm >= 0
    s2 = _sigma2(feats.level, cfg.orb.scale_factor, cfg.tracking.pixel_noise)
    # both basins optimized IN PARALLEL (vmap) — halves the serial LM length
    both = jax.vmap(
        lambda T0: ba.pose_optimize(
            T0, K, pos_f, feats.xy, use, sigma2=s2,
            ur_obs=feats.u_right, bf=cfg.camera.bf,
        )
    )(jnp.stack([T_pred, T_last]))
    a_wins = both.n_inliers[0] >= both.n_inliers[1]
    sel = jnp.where(a_wins, 0, 1)
    opt = ba.PoseOptResult(
        T_cw=both.T_cw[sel],
        inliers=both.inliers[sel],
        n_inliers=both.n_inliers[sel],
    )
    feat_lm = jnp.where(opt.inliers, feat_lm, -1)
    return TrackResult(
        T_cw=opt.T_cw,
        feat_lm=feat_lm,
        n_matches=use.sum().astype(jnp.int32),
        n_inliers=opt.n_inliers,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "n_candidates"))
def track_local_map(
    cfg: SlamConfig,
    m: MapState,
    feats: Features,
    T_cw: jax.Array,
    K: jax.Array,
    feat_lm: jax.Array,
    n_candidates: int = 4096,
    radius_scale: jax.Array | float = 1.0,
) -> TrackResult:
    """Match unassociated features against the frustum-visible landmark pool,
    then run the final pose optimization over ALL associations.

    ``radius_scale`` widens the projection search windows (traced scalar):
    the fused step's recovery retry passes >1 when the motion model failed,
    the batched analog of the reference's TrackReferenceKeyFrame BoW
    fallback (Tracking.cc:296-305,807) — appearance matching with loose
    geometry against the map the frame should see, before declaring loss.
    """
    # project every landmark (the pool is the local map)
    pc = geo.transform_points(T_cw, m.lm_pos)
    uv = geo.project(K, pc)
    z = pc[..., 2]
    H = 2.0 * K[1, 2]
    W = 2.0 * K[0, 2]
    # camera center & viewing ray checks (Frame::isInFrustum, Frame.h:84)
    C = -T_cw[:3, :3].T @ T_cw[:3, 3]
    ray = m.lm_pos - C
    dist = jnp.linalg.norm(ray, axis=-1)
    cos_view = jnp.sum(ray * m.lm_normal, -1) / jnp.maximum(dist, 1e-9)
    vis = (
        m.lm_valid
        & (z > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < W)
        & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        & (dist >= 0.8 * m.lm_dist_min) & (dist <= 1.2 * m.lm_dist_max)
        & (cos_view > 0.5)
    )
    # already-associated landmarks should not be re-matched
    assoc = jnp.zeros((m.lm_pos.shape[0] + 1,), bool).at[
        jnp.where(feat_lm >= 0, feat_lm, m.lm_pos.shape[0])
    ].set(True)[: m.lm_pos.shape[0]]
    vis &= ~assoc

    # take the n_candidates best (visible first) to bound the matmul.
    # Among visible landmarks prefer RECENTLY CREATED ones: a flat 0/1 key
    # ties-break by slot index, so once the frustum holds more than
    # n_candidates valid landmarks the oldest slots always win and newly
    # triangulated territory never reaches the matcher — tracking starves
    # as the camera advances. Recency is the array-pool analog of the
    # reference's covisibility-local-map (UpdateLocalPoints walks the
    # CURRENT frame's neighbor keyframes, Tracking.cc:1268).
    recency = m.lm_first_kf.astype(jnp.float32) / jnp.float32(
        m.kf_pose.shape[0]
    )
    key = vis.astype(jnp.float32) * (1.0 + recency)
    _, cand = jax.lax.top_k(key, n_candidates)
    cand_ok = vis[cand]
    cand_uv = uv[cand]
    cand_desc = m.lm_desc[cand]
    # scale prediction → per-candidate search radius (PredictScale analog)
    pred_level = jnp.clip(
        jnp.floor(
            jnp.log(jnp.maximum(m.lm_dist_max[cand] / jnp.maximum(dist[cand], 1e-6), 1e-6))
            / jnp.log(cfg.orb.scale_factor)
        ),
        0,
        cfg.orb.n_levels - 1,
    )
    radius_base = jnp.where(cos_view[cand] > 0.998, 2.5, 4.0)
    radius = radius_base * cfg.orb.scale_factor ** pred_level * radius_scale

    free = feats.valid & (feat_lm < 0)
    # level band: feat.level - pred_level in [-1, 2]  ⇔  lb - la in [-2, 1]
    res = matching.match_windowed(
        feats.desc,
        cand_desc,
        free,
        cand_ok,
        xy_a=feats.xy,
        xy_b=cand_uv,
        radius_b=radius,
        level_a=feats.level,
        level_b=pred_level,
        lvl_lo=-2.0,
        lvl_hi=1.0,
        max_dist=float(cfg.matcher.th_high),
        ratio=0.8,
    )
    res = matching.resolve_duplicates(res, n_candidates)
    new_lm = jnp.where(res.ok, cand[res.idx], -1)
    feat_lm = jnp.where(feat_lm >= 0, feat_lm, new_lm)

    use = feat_lm >= 0
    pos_f = m.lm_pos[jnp.where(use, feat_lm, 0)]
    opt = ba.pose_optimize(
        T_cw, K, pos_f, feats.xy, use,
        sigma2=_sigma2(feats.level, cfg.orb.scale_factor, cfg.tracking.pixel_noise),
        ur_obs=feats.u_right, bf=cfg.camera.bf,
    )
    feat_lm = jnp.where(opt.inliers, feat_lm, -1)

    # visibility / found counters (MapPoint::IncreaseVisible/Found) — count
    # EVERY frustum-visible landmark as visible, including already-associated
    # ones, so the found/visible ratio stays <= 1
    Lp = m.lm_pos.shape[0]
    vis_all = vis | (assoc & m.lm_valid)
    vis_idx = jnp.where(vis_all, jnp.arange(Lp), Lp)
    found_idx = jnp.where(opt.inliers & (feat_lm >= 0), feat_lm, Lp)
    m = m._replace(
        lm_visible=m.lm_visible.at[vis_idx].add(1, mode="drop"),
        lm_found=m.lm_found.at[found_idx].add(1, mode="drop"),
    )
    return TrackResult(
        T_cw=opt.T_cw,
        feat_lm=feat_lm,
        n_matches=use.sum().astype(jnp.int32),
        n_inliers=opt.n_inliers,
    ), m


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_for_init(cfg: SlamConfig, ref: Features, cur: Features):
    """Level-0 windowed matching for two-view bootstrap
    (reference SearchForInitialization, ORBmatcher.cc:407)."""
    lvl0 = (ref.level[:, None] == 0) & (cur.level[None, :] == 0)
    allowed = matching.window_mask(ref.xy_raw, cur.xy_raw, 100.0) & lvl0
    res = matching.match(
        ref.desc,
        cur.desc,
        ref.valid,
        cur.valid,
        allowed=allowed,
        max_dist=float(cfg.matcher.th_low),
        ratio=cfg.matcher.nn_ratio_init,
        mutual=True,
        angles_a=ref.angle,
        angles_b=cur.angle,
    )
    return matching.resolve_duplicates(res, cur.valid.shape[0])
