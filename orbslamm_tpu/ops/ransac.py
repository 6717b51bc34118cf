"""Batched hypothesize-and-verify solvers (the RANSAC family).

Replaces the reference's iterative RANSAC loops with fixed-budget fully
batched hypothesis evaluation — every hypothesis is solved and scored in
parallel (small-matrix SVDs batch beautifully), then argmax picks the winner:

  * ``two_view_init``  — monocular bootstrap via fundamental matrix only
    (the ORBSLAMM fast-init path, reference Initializer.cc:85-137
    FindFundamental/ReconstructF: 200 iterations of 8-point + cheirality).
  * ``pnp_ransac``     — absolute pose from 2D-3D (reference PnPsolver.cc
    EPnP+RANSAC; here a batched 6-point DLT with orthogonalization).
  * ``sim3_ransac``    — relative Sim3 between keyframes from 3 point pairs
    (reference Sim3Solver.cc:140 iterate / :226 ComputeSim3, Horn 1987).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.ops import geometry as geo


def _sample_indices(key, valid, n_hyp, k):
    """[H, k] indices drawn from valid entries (with replacement)."""
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    return jax.random.choice(key, valid.shape[0], shape=(n_hyp, k), replace=True, p=p)


# ---------------------------------------------------------------------------
# Two-view initialization (F-matrix only, like ORBSLAMM)
# ---------------------------------------------------------------------------

class InitResult(NamedTuple):
    success: jax.Array  # bool
    T21: jax.Array  # [4,4] camera2-from-camera1 (unit-ish translation)
    points1: jax.Array  # [N,3] triangulated points in camera-1 frame
    inliers: jax.Array  # [N] bool (triangulated good points)
    n_inliers: jax.Array


def _normalize_2d(xy, valid):
    w = valid.astype(jnp.float32)[:, None]
    n = jnp.maximum(w.sum(), 1.0)
    mean = (xy * w).sum(0) / n
    d = jnp.abs(xy - mean) * w
    md = jnp.maximum(d.sum(0) / n, 1e-6)
    sx, sy = 1.0 / md[0], 1.0 / md[1]
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    T = T.at[0, 0].set(sx).at[1, 1].set(sy).at[0, 2].set(-mean[0] * sx).at[1, 2].set(-mean[1] * sy)
    xyn = (xy - mean) * jnp.array([sx, sy])
    return xyn, T


def _eight_point(xy1n, xy2n, idx):
    """Batched 8-point: idx [H,8] -> F [H,3,3] (normalized coords)."""
    p1 = xy1n[idx]  # [H,8,2]
    p2 = xy2n[idx]
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # [H,8,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., 8, :].reshape(-1, 3, 3)
    # rank-2 enforcement
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt2)


def _epipolar_score(F, xy1, xy2, valid, sigma: float):
    """Reference CheckFundamental (Initializer.cc): symmetric transfer error
    with chi2 gates, score sums (thScore - chi2). F [H,3,3]."""
    ones = jnp.ones_like(xy1[..., :1])
    p1 = jnp.concatenate([xy1, ones], -1)  # [N,3]
    p2 = jnp.concatenate([xy2, ones], -1)
    l2 = jnp.einsum("hij,nj->hni", F, p1)  # lines in image 2
    l1 = jnp.einsum("hji,nj->hni", F, p2)  # lines in image 1
    d2 = (jnp.einsum("ni,hni->hn", p2, l2)) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = (jnp.einsum("ni,hni->hn", p1, l1)) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    inv_s2 = 1.0 / (sigma * sigma)
    chi1 = d1 * inv_s2
    chi2 = d2 * inv_s2
    th, th_score = 3.841, 5.991
    in1 = chi1 < th
    in2 = chi2 < th
    inlier = in1 & in2 & valid[None, :]
    score = jnp.where(valid[None, :] & in1, th_score - chi1, 0.0) + jnp.where(
        valid[None, :] & in2, th_score - chi2, 0.0
    )
    return score.sum(-1), inlier


def _decompose_E(E):
    """E -> 4 candidate (R, t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def two_view_init(
    xy1: jax.Array,
    xy2: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    n_hyp: int = 256,
    sigma: float = 1.0,
    min_parallax_cos: float = 0.99995,  # per-point gate, ~0.57 deg
    median_parallax_cos: float = 0.99985,  # median-of-inliers gate, 1 deg
    min_inliers: int = 50,
    min_ratio: float = 0.5,
) -> InitResult:
    """Monocular two-view bootstrap: batched 8-point F RANSAC + E
    decomposition + cheirality/parallax triangulation checks.

    xy1/xy2 [N,2] are matched undistorted pixels (same index = match).
    Returns points in the camera-1 frame with median-depth-normalizable
    scale (caller rescales, reference Tracking.cc:739-766).
    """
    N = xy1.shape[0]
    xy1n, T1 = _normalize_2d(xy1, valid)
    xy2n, T2 = _normalize_2d(xy2, valid)
    idx = _sample_indices(key, valid, n_hyp, 8)
    Fn = _eight_point(xy1n, xy2n, idx)  # normalized-coord F
    F = jnp.einsum("ji,hjk,kl->hil", T2, Fn, T1)  # denormalize: T2' Fn T1
    score, inliers_h = _epipolar_score(F, xy1, xy2, valid, sigma)
    best = jnp.argmax(score)
    Fb = F[best]
    inl_F = inliers_h[best]

    E = K.T @ Fb @ K
    cands = _decompose_E(E)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # bearing rays in each camera
    b1 = jnp.stack([(xy1[:, 0] - cx) / fx, (xy1[:, 1] - cy) / fy, jnp.ones(N)], -1)
    b2 = jnp.stack([(xy2[:, 0] - cx) / fx, (xy2[:, 1] - cy) / fy, jnp.ones(N)], -1)

    def eval_cand(Rt):
        R, t = Rt
        P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
        P2 = jnp.concatenate([R, t[:, None]], 1)
        Kf = K.astype(jnp.float32)
        X = geo.triangulate_dlt(Kf @ P1, Kf @ P2, xy1, xy2)  # camera-1 frame
        z1 = X[:, 2]
        Xc2 = X @ R.T + t
        z2 = Xc2[:, 2]
        # parallax between rays to the two camera centers
        C2 = -R.T @ t  # camera-2 center in camera-1 frame
        r1 = X
        r2 = X - C2
        cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
        )
        uv1 = geo.project(K, X)
        uv2 = geo.project(K, Xc2)
        e1 = jnp.sum((uv1 - xy1) ** 2, -1)
        e2 = jnp.sum((uv2 - xy2) ** 2, -1)
        th2 = 4.0 * sigma * sigma
        good = (
            inl_F
            & (z1 > 0)
            & (z2 > 0)
            & (cosp < min_parallax_cos)
            & (e1 < th2)
            & (e2 < th2)
        )
        return good.sum(), (R, t, X, good)

    counts, payloads = zip(*[eval_cand(c) for c in cands])
    counts = jnp.stack(list(counts))
    bestc = jnp.argmax(counts)
    n_best = counts[bestc]
    # stack payloads and select
    Rs = jnp.stack([p[0] for p in payloads])
    ts = jnp.stack([p[1] for p in payloads])
    Xs = jnp.stack([p[2] for p in payloads])
    goods = jnp.stack([p[3] for p in payloads])
    R, t, X, good = Rs[bestc], ts[bestc], Xs[bestc], goods[bestc]

    n_F = inl_F.sum()
    # reference ReconstructF-style ambiguity check: winner must dominate
    second = jnp.sort(counts)[-2]
    # parallax quality gate (ReconstructF/CheckRT: the ~50th-best parallax
    # must exceed 1 degree) — rejects low-baseline inits whose depths are
    # unconstrained even when reprojection checks pass
    C2b = -R.T @ t
    cosp_all = jnp.sum((X) * (X - C2b), -1) / jnp.maximum(
        jnp.linalg.norm(X, axis=-1) * jnp.linalg.norm(X - C2b, axis=-1), 1e-9
    )
    cos_sorted = jnp.sort(jnp.where(good, cosp_all, 1.0))  # high parallax first
    # the reference indexes the 50th point assuming hundreds of inliers; for
    # smaller sets use the median so the gate tests typical (not worst-tail)
    # parallax
    kth = jnp.minimum(50, jnp.maximum(n_best // 2, 0))
    parallax_ok = cos_sorted[kth] < median_parallax_cos
    success = (
        (n_best >= min_inliers)
        & (n_best.astype(jnp.float32) >= min_ratio * n_F.astype(jnp.float32))
        & (second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & parallax_ok
    )
    T21 = geo.rt_to_T(R, t)
    return InitResult(
        success=success,
        T21=T21,
        points1=X,
        inliers=good,
        n_inliers=n_best.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Absolute pose (PnP) RANSAC — relocalization
# ---------------------------------------------------------------------------

class PnPResult(NamedTuple):
    success: jax.Array
    T_cw: jax.Array  # [4,4]
    inliers: jax.Array  # [N]
    n_inliers: jax.Array


def _dlt_pose(pts_w, uv_n, idx):
    """Batched 6-point DLT camera pose from normalized image coords.

    pts_w [N,3], uv_n [N,2] (K-normalized), idx [H,6] -> R [H,3,3], t [H,3].
    """
    P = pts_w[idx]  # [H,6,3]
    u = uv_n[idx][..., 0]
    v = uv_n[idx][..., 1]
    zeros = jnp.zeros_like(P)
    onesc = jnp.ones(P.shape[:-1] + (1,), P.dtype)
    Ph = jnp.concatenate([P, onesc], -1)  # [H,6,4]
    r1 = jnp.concatenate([Ph, jnp.zeros_like(Ph), -u[..., None] * Ph], -1)
    r2 = jnp.concatenate([jnp.zeros_like(Ph), Ph, -v[..., None] * Ph], -1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [H,12,12]
    del zeros
    _, _, Vt = jnp.linalg.svd(A)
    p = Vt[..., 11, :].reshape(-1, 3, 4)
    M = p[..., :3]
    # orthogonalize: M = s R with R in SO3
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = U @ (D[..., None] * Vt2)
    scale = jnp.sum(S * D, -1) / 3.0
    t = p[..., 3] / scale[..., None]
    # resolve sign: points must be in front
    pc = jnp.einsum("hij,hkj->hki", R, P) + t[:, None, :]
    flip = jnp.sum(pc[..., 2] < 0, axis=-1) > 3
    sgn = jnp.where(flip, -1.0, 1.0)[..., None]
    # P defined up to sign: flipping p flips both R (via M) and t
    U2, S2, Vt3 = jnp.linalg.svd(M * sgn[..., None])
    det2 = jnp.linalg.det(U2 @ Vt3)
    D2 = jnp.stack([jnp.ones_like(det2), jnp.ones_like(det2), det2], -1)
    R = U2 @ (D2[..., None] * Vt3)
    scale2 = jnp.sum(S2 * D2, -1) / 3.0
    t = (p[..., 3] * sgn) / scale2[..., None]
    return R, t


def pnp_ransac(
    pts_w: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    sigma: float = 1.0,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Robust absolute pose from 2D-3D matches (reference PnPsolver usage in
    Tracking::Relocalization, Tracking.cc:1404)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uv_n = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
    idx = _sample_indices(key, valid, n_hyp, 6)
    R, t = _dlt_pose(pts_w, uv_n, idx)
    pc = jnp.einsum("hij,nj->hni", R, pts_w) + t[:, None, :]
    uvp = geo.project(K, pc)
    chi2 = jnp.sum((uvp - uv[None]) ** 2, -1) / (sigma * sigma)
    inl = (chi2 < chi2_th) & (pc[..., 2] > 0) & valid[None, :]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    T = geo.rt_to_T(R[best], t[best])
    n = counts[best]
    return PnPResult(
        success=n >= min_inliers,
        T_cw=T,
        inliers=inl[best],
        n_inliers=n.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Sim3 RANSAC — loop closing & map merging
# ---------------------------------------------------------------------------

class Sim3Result(NamedTuple):
    success: jax.Array
    S21: jax.Array  # packed sim3 [8]: maps frame-1 3D points to frame-2
    inliers: jax.Array
    n_inliers: jax.Array


def _horn_3pt(src, dst):
    """Batched minimal Horn: src,dst [H,3,3] -> (s [H], R [H,3,3], t [H,3])."""
    mu_s = src.mean(-2, keepdims=True)
    mu_d = dst.mean(-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    cov = jnp.einsum("hni,hnj->hij", dc, sc) / 3.0
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = U @ (S[..., None] * Vt)
    var = jnp.einsum("hni,hni->h", sc, sc) / 3.0
    s = jnp.sum(D * S, -1) / jnp.maximum(var, 1e-9)
    t = mu_d[:, 0, :] - s[:, None] * jnp.einsum("hij,hj->hi", R, mu_s[:, 0, :])
    return s, R, t


def sim3_ransac(
    pts1: jax.Array,
    pts2: jax.Array,
    valid: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    th2_px: float = 9.86,  # reference Sim3Solver: 9.210 * sigma-ish
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Sim3Result:
    """Relative Sim3 from matched 3D points expressed in two camera frames
    (reference Sim3Solver.cc — points are matched map points transformed
    into each keyframe's camera frame; inliers checked by reprojection in
    BOTH images)."""
    idx = _sample_indices(key, valid, n_hyp, 3)
    s, R, t = _horn_3pt(pts1[idx], pts2[idx])
    if fix_scale:
        s = jnp.ones_like(s)
    # check: project pts1 through S21 into camera 2, and pts2 through inverse
    p12 = s[:, None, None] * jnp.einsum("hij,nj->hni", R, pts1) + t[:, None, :]
    uv2p = geo.project(K2, p12)
    uv2 = geo.project(K2, pts2)
    e2 = jnp.sum((uv2p - uv2[None]) ** 2, -1)
    sinv = 1.0 / jnp.maximum(s, 1e-9)
    Rt = jnp.swapaxes(R, -1, -2)
    p21 = sinv[:, None, None] * jnp.einsum("hij,hnj->hni", Rt, pts2[None] - t[:, None, :])
    uv1p = geo.project(K1, p21)
    uv1 = geo.project(K1, pts1)
    e1 = jnp.sum((uv1p - uv1[None]) ** 2, -1)
    inl = (e1 < th2_px) & (e2 < th2_px) & valid[None, :]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    n = counts[best]
    S21 = geo.sim3_make(s[best], R[best], t[best])
    return Sim3Result(
        success=n >= min_inliers,
        S21=S21,
        inliers=inl[best],
        n_inliers=n.astype(jnp.int32),
    )
