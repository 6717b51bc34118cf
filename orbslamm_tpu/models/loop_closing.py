"""Loop detection and correction (reference LoopClosing.cc, TPU-style).

Pipeline per new keyframe (SURVEY.md §3.4):
  1. BoW candidate retrieval against the keyframe database — one similarity
     matmul + masks (KeyFrameDatabase::DetectLoopCandidates analog), with
     the reference's minScore normalization (min score over covisible KFs).
  2. Geometric verification: masked descriptor matching between landmark-
     bearing features of the two keyframes, then 3D-3D Sim3 RANSAC
     (LoopClosing::ComputeSim3; sim3 absorbs monocular scale drift).
  3. Correction: Sim3 pose-graph over the essential graph (spanning tree +
     strong covisibility + loop edge) with the matched keyframe fixed, then
     landmark correction through each landmark's reference keyframe
     (LoopClosing::CorrectLoop → MMOptimizeEssentialGraph), optionally
     followed by a matrix-free global BA (RunGlobalBundleAdjustment).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.ops import ba, bow, geometry as geo, matching, ransac
from orbslamm_tpu.utils.config import SlamConfig


# ---------------------------------------------------------------------------
# Detection
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def loop_candidates(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_bow: jax.Array,  # [K, n_words] database of keyframe BoW rows
    slot: jax.Array,
    min_gap: int = 10,
):
    """Scores + admissibility mask for loop candidates of keyframe ``slot``.

    Returns (scores [K], allowed [K], min_score scalar).
    """
    v = kf_bow[slot]
    scores = bow.bow_score(v, kf_bow)  # [K]
    W = ms.covisibility(m)
    connected = W[slot] > 0
    K = kf_bow.shape[0]
    ids = jnp.arange(K)
    allowed = (
        m.kf_valid
        & (ids != slot)
        & ~connected
        & (ids < slot - min_gap + 1)  # temporal gap (recent KFs excluded)
    )
    # minScore: lowest BoW score among covisible keyframes (LoopClosing.cc:131)
    cov_scores = jnp.where(connected & m.kf_valid, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(cov_scores), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.05)
    return scores, allowed, min_score


@functools.partial(jax.jit, static_argnames=("cfg", "n_group"))
def candidate_groups(
    cfg: SlamConfig,
    m: ms.MapState,
    scores: jax.Array,  # [K] raw BoW similarity (-1 / 0 where inadmissible)
    n_group: int = 10,
):
    """KFDB-style covisibility-group score accumulation
    (KeyFrameDatabase::DetectLoopCandidates, KeyFrameDatabase.cc:129-200):
    each candidate's score is ACCUMULATED over its top-``n_group`` covisible
    neighbors, and only groups within 0.75x of the best accumulated score
    survive. Under perceptual aliasing raw per-keyframe scores are flat —
    group accumulation rewards PLACES (consistent neighborhoods), which is
    what makes candidate ranking meaningful at small vocabulary sizes.

    Returns (acc [K] accumulated score per candidate-as-representative,
    neighbors [K, K] bool group membership incl. self).
    """
    K = scores.shape[0]
    W = ms.covisibility(m)  # [K, K] shared-landmark counts
    topw, _ = jax.lax.top_k(W, n_group)
    thresh = jnp.maximum(topw[:, -1:], 1)
    neighbors = (W >= thresh) & (W > 0) & m.kf_valid[None, :]
    neighbors = neighbors | jnp.eye(K, dtype=bool)
    s = jnp.maximum(scores, 0.0)
    acc = neighbors @ s  # [K] group-accumulated scores
    acc = jnp.where(scores > 0, acc, -1.0)
    best = jnp.max(acc)
    acc = jnp.where(acc >= 0.75 * best, acc, -1.0)
    return acc, neighbors


@functools.partial(jax.jit, static_argnames=("cfg",))
def merge_scan_scores(
    cfg: SlamConfig,
    m_b: ms.MapState,
    bow_b: jax.Array,  # [K, n_words] map B's BoW database
    slot: jax.Array,  # query keyframe in map B
    m_a: ms.MapState,
    bow_a: jax.Array,  # [K, n_words] base map A's BoW database
):
    """Cross-map candidate retrieval in ONE dispatch (MultiMapper::DetectLoop,
    MultiMapper.cc:124-165): raw scores of B's keyframe against A's database,
    the minScore normalizer from B's covisible keyframes
    (MultiMapper.cc:145-162), and A-side covisibility-group accumulation.

    Returns (scores [K_A], min_score, acc [K_A], neighbors [K_A, K_A])."""
    v = bow_b[slot]
    scores = jnp.where(m_a.kf_valid, bow.bow_score(v, bow_a), -1.0)
    # minScore: lowest similarity to B-covisible keyframes of the query
    Wb = ms.covisibility(m_b)
    conn = (Wb[slot] > 0) & m_b.kf_valid
    own = bow.bow_score(v, bow_b)
    cov_scores = jnp.where(conn, own, jnp.inf)
    min_score = jnp.minimum(jnp.min(cov_scores), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.05)
    acc, neighbors = candidate_groups(cfg, m_a, scores)
    return scores, min_score, acc, neighbors


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_merge_scan_scores(
    cfg: SlamConfig,
    m_b: ms.MapState,
    bow_b: jax.Array,
    slots: jax.Array,  # [Q] int32 query keyframes in map B
    m_a: ms.MapState,
    bow_a: jax.Array,
):
    """merge_scan_scores for a BATCH of query keyframes in one program —
    the deferred scan pipeline scores a whole chunk's keyframe events (plus
    the rescan window) in a single dispatch (MultiMapper.cc:124-165)."""
    return jax.vmap(
        lambda s: merge_scan_scores(cfg, m_b, bow_b, s, m_a, bow_a)
    )(slots)


@functools.partial(jax.jit, static_argnames=("cfg", "min_gap"))
def batched_loop_candidates(
    cfg: SlamConfig,
    m: ms.MapState,
    kf_bow: jax.Array,
    slots: jax.Array,  # [B] int32
    min_gap: int = 10,
):
    """loop_candidates for a batch of keyframes in one program (the chunked
    path scores all of a chunk's new keyframes in a single dispatch)."""
    return jax.vmap(
        lambda s: loop_candidates(cfg, m, kf_bow, s, min_gap=min_gap)
    )(slots)


# ---------------------------------------------------------------------------
# Sim3 verification
# ---------------------------------------------------------------------------

class LoopSim3(NamedTuple):
    success: jax.Array
    S_ba: jax.Array  # packed sim3: maps slot_a camera coords → slot_b camera coords
    n_inliers: jax.Array




def _sim3_between_feature_sets(
    cfg: SlamConfig,
    desc_b, angle_b, pb, has_b,
    desc_a, angle_a, pa, has_a,
    K_b, K_a, key,
    fix_scale: bool = False,
):
    """Staged relative Sim3 between two landmark-bearing feature sets
    (3D points given in each keyframe's camera frame), with the reference's
    full acceptance ladder (MultiMapper.cc:209-362 / LoopClosing::ComputeSim3):

    Stage 1: appearance matching (SearchByBoW analog) — must yield at least
      ``cfg.loop.min_bow_matches`` correspondences (MultiMapper.cc:214).
    Stage 2: Sim3 RANSAC on the matches (Sim3Solver; ``fix_scale`` for
      stereo/RGB-D sensors, Sim3Solver.cc:24-38).
    Stage 3: SearchBySim3 harvest (ORBmatcher.cc:1104) then a nonlinear
      bidirectional-projection refinement (Optimizer::OptimizeSim3 analog,
      ba.sim3_refine) whose inlier count must reach
      ``cfg.loop.min_sim3_inliers`` (MultiMapper.cc:306).
    Stage 4: a second, refined-transform harvest; the TOTAL match count must
      reach ``cfg.loop.min_total_matches`` (MultiMapper.cc:362).
    """
    res = matching.match(
        desc_b, desc_a, has_b, has_a,
        max_dist=float(cfg.matcher.th_low), ratio=0.75, mutual=True,
        angles_a=angle_b, angles_b=angle_a,
    )
    res = matching.resolve_duplicates(res, has_a.shape[0])
    pa_m = pa[res.idx]
    # depth-ratio consistency gate for HYPOTHESIS sampling: candidate
    # keyframes view the scene from nearly the same spot (that is why BoW
    # ranked them), so the norm ratio |pa|/|pb| of a TRUE correspondence
    # approximates the Sim3 scale. Triangulated depth is only weakly
    # constrained along the viewing ray (and projection-window association
    # aliases along it), so a sizeable fraction of matches carry wild depth
    # errors — 3-point Horn on such triples never proposes a transform near
    # the truth (reference Sim3Solver.cc gets away with random triples only
    # because g2o-polished maps have tighter depths). Sampling only from
    # the ratio-consistent majority makes the minimal solver stable; the
    # SearchBySim3 extend stages below re-match and re-count on everything.
    rho = jnp.linalg.norm(pa_m, axis=-1) / jnp.maximum(
        jnp.linalg.norm(pb, axis=-1), 1e-9
    )
    rho_med = jnp.nanmedian(jnp.where(res.ok, rho, jnp.nan))
    rho_med = jnp.where(jnp.isfinite(rho_med), rho_med, 1.0)
    consistent = res.ok & (rho > 0.7 * rho_med) & (rho < 1.43 * rho_med)
    sample_ok = jnp.where(consistent.sum() >= 8, consistent, res.ok)
    s3 = ransac.sim3_ransac(
        pb, pa_m, sample_ok, K_b, K_a, key, min_inliers=8, n_hyp=256,
        fix_scale=fix_scale,
    )
    S = s3.S21  # b-cam -> a-cam

    def count_inliers(S_, pa2, ok):
        pb2a = geo.sim3_apply(S_, pb)
        e_a = jnp.sum((geo.project(K_a, pb2a) - geo.project(K_a, pa2)) ** 2, -1)
        return ok & (e_a < 9.86) & (pb2a[:, 2] > 0.05)

    def extend(S, _):
        # project b-points into a's image through S; match by appearance
        pb_in_a = geo.sim3_apply(S, pb)
        uv_a_pred = geo.project(K_a, pb_in_a)
        uv_a = geo.project(K_a, pa)
        vis = has_b & (pb_in_a[:, 2] > 0.1)
        allowed = (
            jnp.abs(uv_a_pred[:, None, :] - uv_a[None, :, :]).max(-1) <= 9.0
        ) & vis[:, None] & has_a[None, :]
        r2 = matching.match(
            desc_b, desc_a, vis, has_a, allowed=allowed,
            max_dist=float(cfg.matcher.th_high), ratio=1.0,
        )
        r2 = matching.resolve_duplicates(r2, has_a.shape[0])
        pa2 = pa[r2.idx]
        # refit on the depth-ratio-consistent subset (full least squares
        # over all matches is poisoned by the same along-ray depth noise
        # the RANSAC sampling gate protects against), then keep whichever
        # of {current S, refit, refit-on-inliers} explains the most matches
        # — refinement never degrades the hypothesis
        rho2 = jnp.linalg.norm(pa2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(pb, axis=-1), 1e-9
        )
        med2 = jnp.nanmedian(jnp.where(r2.ok, rho2, jnp.nan))
        med2 = jnp.where(jnp.isfinite(med2), med2, 1.0)
        cons2 = r2.ok & (rho2 > 0.7 * med2) & (rho2 < 1.43 * med2)
        fit_ok = jnp.where(cons2.sum() >= 8, cons2, r2.ok)
        s_f, R_f, t_f = geo.umeyama_alignment(
            pb, pa2, mask=fit_ok, with_scale=not fix_scale
        )
        S_new = geo.sim3_make(s_f, R_f, t_f)
        inl_old = count_inliers(S, pa2, r2.ok)
        inl_new = count_inliers(S_new, pa2, r2.ok)
        take = inl_new.sum() > inl_old.sum()
        S1 = jnp.where(take, S_new, S)
        inl1 = jnp.where(take, inl_new, inl_old)
        # one IRLS round: refit on the current inlier set
        s_2, R_2, t_2 = geo.umeyama_alignment(
            pb, pa2, mask=inl1 & (inl1.sum() >= 4), with_scale=not fix_scale
        )
        S2 = geo.sim3_make(s_2, R_2, t_2)
        inl2 = count_inliers(S2, pa2, r2.ok)
        take2 = inl2.sum() > inl1.sum()
        S_out = jnp.where(take2, S2, S1)
        inl = jnp.where(take2, inl2, inl1)
        return S_out, inl, r2.ok, pa2

    S, inl, r2_ok, pa2 = extend(S, None)
    # OptimizeSim3 analog (Optimizer.cc:1349): nonlinear bidirectional
    # projection refinement with inlier pruning; its inlier count is the
    # reference's >=20 acceptance gate (MultiMapper.cc:306)
    ref = ba.sim3_refine(S, pb, pa2, r2_ok, K_b, K_a, fix_scale=fix_scale)
    n_opt = ref.n_inliers
    S = jnp.where(n_opt >= inl.sum(), ref.S, S)
    # second harvest at the refined transform; TOTAL matches is the
    # reference's >=40 gate (MultiMapper.cc:362)
    S, inl, r2_ok2, _ = extend(S, None)
    n = inl.sum().astype(jnp.int32)
    n_total = r2_ok2.sum().astype(jnp.int32)
    success = (
        (res.ok.sum() >= cfg.loop.min_bow_matches)
        & (jnp.maximum(n_opt, n) >= cfg.loop.min_sim3_inliers)
        & (n_total >= cfg.loop.min_total_matches)
    )
    return success, S, n


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_loop_sim3(
    cfg: SlamConfig, m: ms.MapState, slot_a: jax.Array, slot_b: jax.Array, key
) -> LoopSim3:
    """Two-stage relative Sim3 between keyframes of the SAME map
    (ComputeSim3, LoopClosing.cc:237: SearchByBoW → Sim3 RANSAC →
    SearchBySim3 → OptimizeSim3). S_ba maps slot_a camera → slot_b camera."""
    has_a = m.kf_feat_valid[slot_a] & (m.kf_obs_lm[slot_a] >= 0)
    has_b = m.kf_feat_valid[slot_b] & (m.kf_obs_lm[slot_b] >= 0)
    lm_a = jnp.maximum(m.kf_obs_lm[slot_a], 0)
    lm_b = jnp.maximum(m.kf_obs_lm[slot_b], 0)
    has_a &= m.lm_valid[lm_a]
    has_b &= m.lm_valid[lm_b]
    pa = geo.transform_points(m.kf_pose[slot_a], m.lm_pos[lm_a])
    pb = geo.transform_points(m.kf_pose[slot_b], m.lm_pos[lm_b])
    success, S, n = _sim3_between_feature_sets(
        cfg,
        m.kf_desc[slot_a], m.kf_angle[slot_a], pa, has_a,
        m.kf_desc[slot_b], m.kf_angle[slot_b], pb, has_b,
        m.kf_K[slot_a], m.kf_K[slot_b], key,
        # stereo/RGB-D sensors pin metric scale: the loop Sim3 must not
        # rescale the map (Sim3Solver mbFixScale, LoopClosing.cc:237)
        fix_scale=cfg.sensor != "mono",
    )
    return LoopSim3(success=success, S_ba=S, n_inliers=n)


# ---------------------------------------------------------------------------
# Correction
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("cfg", "max_cov_edges", "iters")
)
def correct_loop(
    cfg: SlamConfig,
    m: ms.MapState,
    slot_a: jax.Array,
    slot_b: jax.Array,
    S_ba: jax.Array,
    max_cov_edges: int = 256,
    iters: int = 20,
) -> ms.MapState:
    """Essential-graph Sim3 optimization + landmark correction."""
    K = m.kf_pose.shape[0]
    S_old = jax.vmap(geo.sim3_from_se3)(m.kf_pose)  # [K,8]
    # corrected current-KF node: S_aw = S_ba^-1 ∘ S_bw
    S_aw_corr = geo.sim3_compose(geo.sim3_inv(S_ba), S_old[slot_b])
    S_init = S_old.at[slot_a].set(S_aw_corr)

    # --- edges ---
    parent = ms.spanning_parent(m)
    ids = jnp.arange(K, dtype=jnp.int32)
    span_i = ids
    span_j = jnp.maximum(parent, 0)
    span_ok = (parent >= 0) & m.kf_valid
    W = ms.covisibility(m)
    triu = jnp.triu(W, k=1) * m.kf_valid[:, None] * m.kf_valid[None, :]
    flat = triu.reshape(-1)
    _, top = jax.lax.top_k(flat, max_cov_edges)
    cov_i = (top // K).astype(jnp.int32)
    cov_j = (top % K).astype(jnp.int32)
    cov_ok = flat[top] >= cfg.loop.essential_graph_min_weight

    # persist the new loop edge (KeyFrame::AddLoopEdge, LoopClosing.cc:577)
    # and include EVERY recorded past loop edge in this essential graph
    # (Optimizer.cc:1126-1139) so this correction cannot re-break a
    # previously closed seam
    le = m.loop_edges
    free_row = jnp.argmax(le[:, 0] < 0).astype(jnp.int32)
    le = le.at[free_row].set(jnp.stack([slot_a, slot_b]).astype(jnp.int32))
    past_ok = (le[:, 0] >= 0) & (
        jnp.arange(le.shape[0]) != free_row
    ) & m.kf_valid[jnp.maximum(le[:, 0], 0)] & m.kf_valid[jnp.maximum(le[:, 1], 0)]
    past_i = jnp.maximum(le[:, 0], 0)
    past_j = jnp.maximum(le[:, 1], 0)

    edge_i = jnp.concatenate([span_i, cov_i, past_i, slot_a[None]])
    edge_j = jnp.concatenate([span_j, cov_j, past_j, slot_b[None]])
    edge_ok = jnp.concatenate([span_ok, cov_ok, past_ok, jnp.ones(1, bool)])
    # measurements from OLD poses except the loop edge (measured Sim3)
    M_old = jax.vmap(lambda i, j: geo.sim3_compose(S_old[i], geo.sim3_inv(S_old[j])))(
        edge_i, edge_j
    )
    M_loop = geo.sim3_compose(S_aw_corr, geo.sim3_inv(S_old[slot_b]))
    M = M_old.at[-1].set(M_loop)
    E = le.shape[0]
    weight = jnp.ones(edge_i.shape[0]).at[-1].set(5.0)
    # past loop edges keep elevated weight: they are verified constraints
    weight = weight.at[-(E + 1) : -1].set(jnp.where(past_ok, 3.0, 1.0))

    prob = ba.PoseGraphProblem(
        S_iw=S_init,
        node_valid=m.kf_valid,
        node_fixed=jnp.zeros(K, bool).at[slot_b].set(True),
        edge_i=edge_i,
        edge_j=edge_j,
        edge_Sij=M,
        edge_valid=edge_ok,
        edge_weight=weight,
    )
    # CG budget scales with graph size: information propagates ~1 edge-hop
    # per iteration, and big maps have proportionally longer spanning chains
    S_new = ba.pose_graph_optimize(
        prob, iters=iters, cg_iters=max(50, min(400, K // 2))
    )

    # --- apply: poses ---
    T_new = jax.vmap(geo.sim3_to_se3)(S_new)
    kf_pose = jnp.where(m.kf_valid[:, None, None], T_new, m.kf_pose)

    # --- apply: landmarks through their reference keyframe ---
    # p_new = S_new_ref^-1 ∘ S_old_ref (p_old): keep the landmark's camera-
    # frame position in its reference KF invariant under the correction
    ref = jnp.clip(m.lm_ref_kf, 0, K - 1)
    S_corr = jax.vmap(
        lambda r: geo.sim3_compose(geo.sim3_inv(S_new[r]), S_old[r])
    )(ref)
    lm_new = jax.vmap(geo.sim3_apply)(S_corr, m.lm_pos)
    lm_pos = jnp.where(m.lm_valid[:, None], lm_new, m.lm_pos)
    # viewing normals rotate and the scale-invariance distance band scales
    # with the correction — leaving them stale makes the matcher's
    # view-angle (cos>0.5) and distance-band gates reject the corrected
    # landmarks wholesale (most visible after merges, where the relative
    # Sim3 carries real scale; reference UpdateNormalAndDepth re-derives
    # them, MapPoint.cc:330)
    s_c, R_c, _ = geo.sim3_parts(S_corr)
    n_new = jnp.einsum("lij,lj->li", R_c, m.lm_normal)
    lm_normal = jnp.where(m.lm_valid[:, None], n_new, m.lm_normal)
    lm_dmin = jnp.where(m.lm_valid, m.lm_dist_min * s_c, m.lm_dist_min)
    lm_dmax = jnp.where(m.lm_valid, m.lm_dist_max * s_c, m.lm_dist_max)
    return m._replace(kf_pose=kf_pose, lm_pos=lm_pos, lm_normal=lm_normal,
                      lm_dist_min=lm_dmin, lm_dist_max=lm_dmax,
                      loop_edges=le)


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "cg_iters", "obs_per_kf")
)
def global_bundle_adjust(
    cfg: SlamConfig, m: ms.MapState, iters: int = 10, cg_iters: int = 30,
    obs_per_kf: int = 512,
) -> ms.MapState:
    """Full-map BA with the matrix-free Schur solver (GBA analog).

    The edge list is COMPACTED before the solve: only ~a quarter of the
    per-keyframe feature slots carry a live landmark observation, so taking
    each keyframe's top-``obs_per_kf`` valid slots shrinks every edge-wise
    pass ~4x at bench capacities with negligible information loss (measured
    ~760 ms → the per-slice budget that lets overlapped GBA ride chunk
    boundaries without stalling the two-robot pipeline; PROFILE.md r5)."""
    K, Mfeat = m.kf_obs_lm.shape
    obs_lm = m.kf_obs_lm
    feat_ok = m.kf_feat_valid & (obs_lm >= 0) & m.kf_valid[:, None]
    lm_idx = jnp.maximum(obs_lm, 0)
    feat_ok &= m.lm_valid[lm_idx]
    sigma2 = (
        cfg.tracking.pixel_noise
        * cfg.orb.scale_factor ** m.kf_level.astype(jnp.float32)
    ) ** 2
    E_kf = min(obs_per_kf, Mfeat)
    if E_kf < Mfeat:
        # valid observations first (ties broken toward low feature index)
        key = feat_ok.astype(jnp.float32) * 2.0 - jnp.arange(
            Mfeat, dtype=jnp.float32
        ) / Mfeat
        _, sel = jax.lax.top_k(key, E_kf)  # [K, E_kf]
        take = jnp.take_along_axis
        lm_idx = take(lm_idx, sel, 1)
        feat_ok = take(feat_ok, sel, 1)
        xy = take(m.kf_xy, sel[..., None], 1)
        sigma2 = take(sigma2, sel, 1)
        ur = take(m.kf_ur, sel, 1)
    else:
        xy, ur = m.kf_xy, m.kf_ur
    obs_cam = jnp.broadcast_to(jnp.arange(K)[:, None], (K, E_kf))
    prob = ba.BAProblem(
        T_cw=m.kf_pose,
        K=m.kf_K,
        cam_valid=m.kf_valid,
        cam_fixed=m.kf_fixed,
        points=m.lm_pos,
        point_valid=m.lm_valid,
        obs_cam=obs_cam.reshape(-1).astype(jnp.int32),
        obs_point=lm_idx.reshape(-1).astype(jnp.int32),
        obs_uv=xy.reshape(-1, 2),
        obs_sigma2=sigma2.reshape(-1),
        obs_valid=feat_ok.reshape(-1),
        obs_ur=ur.reshape(-1) if cfg.camera.bf > 0 else None,
        bf=(
            jnp.full((K,), cfg.camera.bf, jnp.float32)
            if cfg.camera.bf > 0
            else None
        ),
    )
    res = ba.bundle_adjust_cg(prob, iters=iters, cg_iters=cg_iters)
    return m._replace(
        kf_pose=jnp.where(m.kf_valid[:, None, None], res.T_cw, m.kf_pose),
        lm_pos=res.points,
    ), res.cost


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_loop_sim3_cross(
    cfg: SlamConfig,
    m_b: ms.MapState,
    m_a: ms.MapState,
    slot_b: jax.Array,
    slot_a: jax.Array,
    key,
) -> LoopSim3:
    """Cross-MAP Sim3: keyframe ``slot_b`` of map B vs ``slot_a`` of map A
    (the MultiMapper merge verification, MultiMapper.cc:209-316). Returns
    S_ba mapping B-keyframe camera coords → A-keyframe camera coords."""
    has_b = m_b.kf_feat_valid[slot_b] & (m_b.kf_obs_lm[slot_b] >= 0)
    has_a = m_a.kf_feat_valid[slot_a] & (m_a.kf_obs_lm[slot_a] >= 0)
    lm_b = jnp.maximum(m_b.kf_obs_lm[slot_b], 0)
    lm_a = jnp.maximum(m_a.kf_obs_lm[slot_a], 0)
    has_b &= m_b.lm_valid[lm_b]
    has_a &= m_a.lm_valid[lm_a]
    pb = geo.transform_points(m_b.kf_pose[slot_b], m_b.lm_pos[lm_b])
    pa = geo.transform_points(m_a.kf_pose[slot_a], m_a.lm_pos[lm_a])
    success, S, n = _sim3_between_feature_sets(
        cfg,
        m_b.kf_desc[slot_b], m_b.kf_angle[slot_b], pb, has_b,
        m_a.kf_desc[slot_a], m_a.kf_angle[slot_a], pa, has_a,
        m_b.kf_K[slot_b], m_a.kf_K[slot_a], key,
        fix_scale=cfg.sensor != "mono",
    )
    return LoopSim3(success=success, S_ba=S, n_inliers=n)


@functools.partial(jax.jit, static_argnames=("cfg",))
def relocalization_candidates(
    cfg: SlamConfig, m: ms.MapState, kf_bow: jax.Array, v: jax.Array
):
    """Scores+mask for relocalizing a lost frame against the keyframe
    database (KeyFrameDatabase::DetectRelocalizationCandidates analog)."""
    scores = bow.bow_score(v, kf_bow)
    return jnp.where(m.kf_valid, scores, -1.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def relocalize_against_kf(
    cfg: SlamConfig,
    m: ms.MapState,
    feats,
    K: jax.Array,
    cand: jax.Array,
    key,
):
    """PnP relocalization of a frame against keyframe ``cand``
    (Tracking::Relocalization, Tracking.cc:1404: SearchByBoW → EPnP RANSAC →
    PoseOptimization). Returns (success, T_cw, feat_lm, n_inliers)."""
    has = m.kf_feat_valid[cand] & (m.kf_obs_lm[cand] >= 0)
    lm = jnp.maximum(m.kf_obs_lm[cand], 0)
    has &= m.lm_valid[lm]
    res = matching.match(
        feats.desc,
        m.kf_desc[cand],
        feats.valid,
        has,
        max_dist=float(cfg.matcher.th_low),
        ratio=0.75,
        mutual=True,
        angles_a=feats.angle,
        angles_b=m.kf_angle[cand],
    )
    res = matching.resolve_duplicates(res, has.shape[0])
    feat_lm = jnp.where(res.ok, lm[res.idx], -1)
    use = feat_lm >= 0
    pts = m.lm_pos[jnp.maximum(feat_lm, 0)]
    pnp = ransac.pnp_ransac(pts, feats.xy, use, K, key, min_inliers=10)
    sigma2 = (
        cfg.tracking.pixel_noise
        * cfg.orb.scale_factor ** feats.level.astype(jnp.float32)
    ) ** 2
    opt = ba.pose_optimize(pnp.T_cw, K, pts, feats.xy, use & pnp.inliers, sigma2=sigma2)
    feat_lm = jnp.where(opt.inliers, feat_lm, -1)
    success = pnp.success & (opt.n_inliers >= 30)
    return success, opt.T_cw, feat_lm, opt.n_inliers
