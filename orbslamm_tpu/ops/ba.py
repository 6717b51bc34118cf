"""Nonlinear least-squares optimizers (the g2o replacement).

This module re-designs the reference's Optimizer.cc around batched, fixed
-shape Levenberg–Marquardt:

  * ``pose_optimize``     — motion-only BA (reference PoseOptimization,
    Optimizer.cc:261: 4 rounds x 10 iterations, Huber, chi2 5.991 outlier
    re-classification between rounds).
  * ``local_bundle_adjust`` / ``bundle_adjust`` — structure+motion LM with a
    dense-in-blocks Schur complement (reference LocalBundleAdjustment
    Optimizer.cc:475 and (MM)GlobalBundleAdjustemnt :40/:59): per-point 3x3
    Hessians are inverted in batch, the reduced camera system is a dense
    [6C, 6C] solve — camera counts in SLAM windows are small, so a dense
    reduced system on the MXU beats sparse scalar code by orders of
    magnitude.
  * ``pose_graph_optimize`` — Sim3 essential-graph optimization (reference
    (MM)OptimizeEssentialGraph, Optimizer.cc:803/:1068): exact per-edge
    autodiff Jacobians, dense LM over all keyframe Sim3s.

All functions are jit-safe with static capacities and validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.ops import geometry as geo

CHI2_MONO = 5.991  # 2-DoF 95% (reference Optimizer.cc chi2Mono)
CHI2_STEREO = 7.815  # 3-DoF 95% (reference Optimizer.cc chi2Stereo)


def _project_and_residual(T_cw, K, pts_w, uv_obs):
    pc = geo.transform_points(T_cw, pts_w)
    uv = geo.project(K, pc)
    return uv - uv_obs, pc


def _pose_jacobian(K, pc):
    """d(residual)/d(se3 left-perturbation of T_cw): [N, 2, 6]."""
    fx, fy = K[0, 0], K[1, 1]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    # du/dpc rows
    du = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)  # [N,3]
    dv = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    dpd = jnp.stack([du, dv], axis=-2)  # [N,2,3]
    # dpc/dxi = [I | -[pc]x]
    px = geo.skew(pc)  # [N,3,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), px.shape)
    dpc = jnp.concatenate([eye, -px], axis=-1)  # [N,3,6]
    return dpd @ dpc  # [N,2,6]


class PoseOptResult(NamedTuple):
    T_cw: jax.Array  # [4,4]
    inliers: jax.Array  # [N] bool
    n_inliers: jax.Array  # int32


def pose_optimize(
    T_init: jax.Array,
    K: jax.Array,
    pts_w: jax.Array,
    uv_obs: jax.Array,
    valid: jax.Array,
    sigma2: jax.Array | float = 1.0,
    rounds: int = 4,
    iters: int = 10,
    chi2_th: float | jax.Array = CHI2_MONO,
    ur_obs: jax.Array | None = None,
    bf: float = 0.0,
) -> PoseOptResult:
    """Motion-only bundle adjustment (reference Optimizer::PoseOptimization).

    pts_w [N,3] world landmarks, uv_obs [N,2] their measured pixels, valid
    [N] observation mask, sigma2 per-observation measurement variance
    (1.2^(2*octave) in the reference's pyramid noise model).

    ur_obs [N] optional stereo right-x measurements (-1 = mono observation):
    adds the reference's stereo residual u_r = u - bf/z as a third row
    (EdgeStereoSE3ProjectXYZOnlyPose) — this is what pins METRIC scale every
    frame in stereo/RGB-D mode. chi2 gating switches to the 3-DoF threshold
    on stereo rows automatically.
    """
    sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, jnp.float32), valid.shape)
    inv_s2 = 1.0 / sigma2
    has_ur = None
    if ur_obs is not None:
        has_ur = ur_obs >= 0.0
        chi2_th = jnp.where(has_ur, CHI2_STEREO, chi2_th)
    delta_h = jnp.sqrt(chi2_th * sigma2)  # Huber threshold per obs (pixels)

    def residual(T):
        r, pc = _project_and_residual(T, K, pts_w, uv_obs)
        if ur_obs is None:
            return r, pc
        z = jnp.maximum(pc[..., 2], 1e-6)
        uv = r + uv_obs  # projected uv
        r3 = (uv[..., 0] - bf / z - ur_obs) * has_ur
        return jnp.concatenate([r, r3[..., None]], axis=-1), pc

    def jac(pc):
        J = _pose_jacobian(K, pc)  # [N,2,6]
        if ur_obs is None:
            return J
        fx = K[0, 0]
        x, z = pc[..., 0], pc[..., 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        zi2 = zi * zi
        # d(u_r)/dpc = d(u)/dpc + [0, 0, bf/z^2]
        du_r = jnp.stack([fx * zi, jnp.zeros_like(x), -fx * x * zi2 + bf * zi2],
                         axis=-1)  # [N,3]
        px = geo.skew(pc)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), px.shape)
        dpc = jnp.concatenate([eye, -px], axis=-1)  # [N,3,6]
        J3 = (du_r[..., None, :] @ dpc)[..., 0, :] * has_ur[..., None]  # [N,6]
        return jnp.concatenate([J, J3[..., None, :]], axis=-2)  # [N,3,6]

    def cost_of(r, pc, mask):
        """Huber cost from an already-computed residual pass."""
        rrn2 = jnp.sum(r * r, axis=-1) * inv_s2
        hub = jnp.where(
            rrn2 <= chi2_th, rrn2, 2.0 * jnp.sqrt(chi2_th * rrn2) - chi2_th
        )
        return jnp.sum(jnp.where(mask & (pc[..., 2] > 1e-3), hub, 0.0))

    def lm_body(carry):
        T, lam, mask, _ = carry
        r, pc = residual(T)
        behind = pc[..., 2] < 1e-3
        use = mask & ~behind
        J = jac(pc)  # [N,D,6]
        rn = jnp.linalg.norm(r, axis=-1)
        # Huber IRLS weight * information
        w = jnp.where(rn > delta_h, delta_h / jnp.maximum(rn, 1e-9), 1.0) * inv_s2
        w = jnp.where(use, w, 0.0)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nia,nib->ab", Jw, J)
        g = jnp.einsum("nia,ni->a", Jw, r)
        H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(H_lm, g)
        T_new = geo.se3_exp(dx) @ T
        # accept if robust cost decreased (c_old reuses this pass's residual)
        c_old = cost_of(r, pc, mask)
        r2_, pc2_ = residual(T_new)
        c_new = cost_of(r2_, pc2_, mask)
        better = c_new < c_old
        T = jnp.where(better, T_new, T)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4))
        # converged: an ACCEPTED step that is both tiny in the tangent space
        # and yields negligible cost improvement (or damping pinned at its
        # cap with no acceptable step) — stop paying for the remaining
        # iterations (lax.cond skips the body). Both conditions are required:
        # a damped small step with a flat cost is NOT convergence.
        done = (
            better
            & (c_old - c_new <= 1e-5 * c_old)
            & (jnp.sum(dx * dx) < 1e-10)
        ) | (~better & (lam >= 1e4))
        return (T, lam, mask, done)

    def lm_iter(carry, _):
        carry = jax.lax.cond(carry[3], lambda c: c, lm_body, carry)
        return carry, None

    def chi2_mask(T):
        r, pc = residual(T)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        return valid & (chi2 <= chi2_th) & (pc[..., 2] > 1e-3)

    T = T_init
    mask = valid
    for _ in range(rounds):
        (T, _, _, _), _ = jax.lax.scan(
            lm_iter, (T, jnp.float32(1e-2), mask, jnp.asarray(False)), None,
            length=iters,
        )
        mask = chi2_mask(T)
    return PoseOptResult(T_cw=T, inliers=mask, n_inliers=mask.sum().astype(jnp.int32))


# ---------------------------------------------------------------------------
# Structure + motion bundle adjustment (Schur-complement LM)
# ---------------------------------------------------------------------------

class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem in edge-list (CSR-free) form.

    The observation edge list is THE sharding axis for distributed BA: all
    reductions below are segment-sums over edges, so sharding edges across
    devices and psum-ing the reduced blocks gives the multi-chip path
    (parallel/dist_ba.py) with no change to the math.
    """

    T_cw: jax.Array  # [C,4,4] camera poses
    K: jax.Array  # [C,3,3] per-camera intrinsics (multi-robot: different calib)
    cam_valid: jax.Array  # [C] bool
    cam_fixed: jax.Array  # [C] bool — gauge anchors (origin KF; merge un-fixes)
    points: jax.Array  # [P,3]
    point_valid: jax.Array  # [P] bool
    obs_cam: jax.Array  # [E] int32
    obs_point: jax.Array  # [E] int32
    obs_uv: jax.Array  # [E,2]
    obs_sigma2: jax.Array  # [E]
    obs_valid: jax.Array  # [E] bool
    # stereo extension (reference EdgeStereoSE3ProjectXYZ): right-x
    # measurement per observation (-1 = mono edge) and per-camera
    # baseline*fx. None → pure monocular problem (unchanged trace).
    obs_ur: jax.Array | None = None  # [E]
    bf: jax.Array | None = None  # [C]


class BAResult(NamedTuple):
    T_cw: jax.Array
    points: jax.Array
    obs_inlier: jax.Array  # [E] final chi2 classification
    cost: jax.Array


def _ba_residuals(T_cw, K, points, p: BAProblem):
    Tc = T_cw[p.obs_cam]  # [E,4,4]
    Kc = K[p.obs_cam]
    pw = points[p.obs_point]
    pc = jnp.einsum("eij,ej->ei", Tc[:, :3, :3], pw) + Tc[:, :3, 3]
    uv = geo.project(Kc, pc)
    r = uv - p.obs_uv
    if p.obs_ur is not None:
        # stereo third row: (u - bf/z) - u_r_obs, zeroed on mono edges
        z = jnp.maximum(pc[:, 2], 1e-6)
        bf_e = p.bf[p.obs_cam]
        has = p.obs_ur >= 0.0
        r3 = (uv[:, 0] - bf_e / z - p.obs_ur) * has
        r = jnp.concatenate([r, r3[:, None]], axis=-1)  # [E,3]
    return r, pc, Tc, Kc


def _ba_jacobians(Kc, Tc, pc, p: BAProblem):
    """Per-edge J wrt camera twist [E,D,6] and wrt point [E,D,3]
    (D=2 mono, D=3 with the stereo u_r row)."""
    fx, fy = Kc[:, 0, 0], Kc[:, 1, 1]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)
    dv = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    rows = [du, dv]
    if p.obs_ur is not None:
        bf_e = p.bf[p.obs_cam]
        has = (p.obs_ur >= 0.0).astype(pc.dtype)
        # d(u - bf/z)/dpc = du/dpc + [0, 0, bf/z^2]
        dur = jnp.stack([fx * zi, zero, -fx * x * zi2 + bf_e * zi2], axis=-1)
        rows.append(dur * has[:, None])
    dpd = jnp.stack(rows, axis=-2)  # [E,D,3]
    px = geo.skew(pc)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), px.shape)
    Jc = dpd @ jnp.concatenate([eye, -px], axis=-1)  # [E,D,6]
    Jp = dpd @ Tc[:, :3, :3]  # [E,D,3]
    return Jc, Jp


def _chi2_per_edge(p: BAProblem, chi2_th):
    """Per-edge chi2 gate: 3-DoF threshold on stereo edges."""
    if p.obs_ur is None:
        return chi2_th
    return jnp.where(p.obs_ur >= 0.0, CHI2_STEREO, chi2_th)


def _robust_weights(r, sigma2, use, chi2_th):
    """Huber IRLS weight times information (1/sigma2)."""
    inv_s2 = 1.0 / sigma2
    rn = jnp.linalg.norm(r, axis=-1)
    delta = jnp.sqrt(chi2_th * sigma2)
    w = jnp.where(rn > delta, delta / jnp.maximum(rn, 1e-9), 1.0) * inv_s2
    return jnp.where(use, w, 0.0)


def _ba_cost_from_residual(r, pc, p: BAProblem, use, chi2_th):
    chi2 = jnp.sum(r * r, -1) / p.obs_sigma2
    hub = jnp.where(chi2 <= chi2_th, chi2, 2.0 * jnp.sqrt(chi2_th * chi2) - chi2_th)
    return jnp.sum(jnp.where(use & (pc[:, 2] > 1e-3), hub, 0.0))


def _ba_cost(T_cw, K, points, p: BAProblem, use, chi2_th):
    r, pc, _, _ = _ba_residuals(T_cw, K, points, p)
    return _ba_cost_from_residual(r, pc, p, use, chi2_th)


def bundle_adjust(
    p: BAProblem,
    iters: int = 10,
    chi2_th: float = CHI2_MONO,
    lam0: float = 1e-4,
    reclassify_every: int = 0,
) -> BAResult:
    """Levenberg–Marquardt BA with dense Schur-complement camera solve.

    Replaces reference Optimizer::BundleAdjustment / LocalBundleAdjustment
    (Optimizer.cc:67/:475). Dense [6C,6C] reduced system — C is the (small)
    camera-window capacity; the MXU eats this. Fixed cameras contribute
    constraints but receive no update (their tangent rows are zeroed).
    """
    C = p.T_cw.shape[0]
    E = p.obs_cam.shape[0]
    chi2_e = _chi2_per_edge(p, chi2_th)

    def step_body(carry):
        T_cw, points, lam, _ = carry
        r, pc, Tc, Kc = _ba_residuals(T_cw, K=p.K, points=points, p=p)
        use = p.obs_valid & (pc[:, 2] > 1e-3) \
            & p.cam_valid[p.obs_cam] & p.point_valid[p.obs_point]
        w = _robust_weights(r, p.obs_sigma2, use, chi2_e)
        Jc, Jp = _ba_jacobians(Kc, Tc, pc, p)
        # zero out fixed cameras' jacobians → no update, no Schur coupling
        free = ~p.cam_fixed
        Jc = Jc * free[p.obs_cam][:, None, None]

        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]
        Hcc = jnp.zeros((C, 6, 6)).at[p.obs_cam].add(jnp.einsum("eia,eib->eab", wJc, Jc))
        Hpp = jnp.zeros((points.shape[0], 3, 3)).at[p.obs_point].add(
            jnp.einsum("eia,eib->eab", wJp, Jp)
        )
        gc = jnp.zeros((C, 6)).at[p.obs_cam].add(jnp.einsum("eia,ei->ea", wJc, r))
        gp = jnp.zeros((points.shape[0], 3)).at[p.obs_point].add(
            jnp.einsum("eia,ei->ea", wJp, r)
        )
        # damping (absolute floor keeps barely-observed blocks invertible)
        Hcc_d = Hcc + ((lam + 1e-5) * jnp.eye(6))[None] * jnp.maximum(
            jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0
        )
        Hpp_d = Hpp + ((lam + 1e-5) * jnp.eye(3))[None] * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
        )
        # points with no effective observations get an identity block (dp=0)
        w_per_pt = jnp.zeros((points.shape[0],)).at[p.obs_point].add(w)
        observed = w_per_pt > 1e-9
        Hpp_d = jnp.where(observed[:, None, None], Hpp_d, jnp.eye(3)[None])
        Hpp_inv = _inv3x3(Hpp_d)

        # W = Hcp: dense [C,P,6,3] scatter (local-BA scale)
        Wcp = jnp.einsum("eia,eib->eab", wJc, Jp)  # [E,6,3]
        P = points.shape[0]
        Wd = jnp.zeros((C, P, 6, 3)).at[p.obs_cam, p.obs_point].add(Wcp)
        # S = Hcc - W Hpp^-1 W^T ; rhs = gc - W Hpp^-1 gp
        WHinv = jnp.einsum("cpab,pbd->cpad", Wd, Hpp_inv)
        S = jnp.einsum("cpad,qpbd->cqab", WHinv, Wd)  # [C,C,6,6] sum over p
        Sfull = -S
        Sfull = Sfull.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
        rhs = gc - jnp.einsum("cpad,pd->ca", WHinv, gp)
        Smat = Sfull.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        # fixed/invalid cameras: identity rows (no update)
        lock = (p.cam_fixed | ~p.cam_valid)
        lockv = jnp.repeat(lock, 6)
        Smat = jnp.where(lockv[:, None] | lockv[None, :],
                         jnp.eye(C * 6), Smat)
        rhsv = jnp.where(lockv, 0.0, rhs.reshape(-1))
        dc = -jnp.linalg.solve(Smat, rhsv).reshape(C, 6)
        # back-substitute points: dp = -Hpp^-1 (gp + W^T dc)
        Wt_dc = jnp.einsum("cpab,ca->pb", Wd, dc)
        dp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + Wt_dc)
        dp = dp * (p.point_valid & observed)[:, None]

        T_new = jax.vmap(lambda d, T: geo.se3_exp(d) @ T)(dc, T_cw)
        T_new = jnp.where(lock[:, None, None], T_cw, T_new)
        pts_new = points + dp

        # c_old from the residual pass already computed above
        c_old = _ba_cost_from_residual(r, pc, p, p.obs_valid, chi2_e)
        c_new = _ba_cost(T_new, p.K, pts_new, p, p.obs_valid, chi2_e)
        finite = jnp.isfinite(c_new) & jnp.isfinite(T_new).all() & jnp.isfinite(pts_new).all()
        better = (c_new < c_old) & finite
        T_cw = jnp.where(better, T_new, T_cw)
        points = jnp.where(better, pts_new, points)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 5.0, 1e3))
        # converged (or damping pinned with no acceptable step): skip the
        # remaining iterations' work via lax.cond. Requires BOTH a tiny
        # accepted update and negligible improvement — either alone can be
        # a damped stall, not convergence.
        step_sq = jnp.sum(dc * dc) + jnp.sum(dp * dp)
        done = (
            better & (c_old - c_new <= 1e-5 * c_old) & (step_sq < 1e-10)
        ) | (~better & (lam >= 1e3))
        return (T_cw, points, lam, done)

    def step(carry, it):
        carry = jax.lax.cond(carry[3], lambda c: c, step_body, carry)
        return carry, None

    (T_cw, points, _, _), _ = jax.lax.scan(
        step, (p.T_cw, p.points, jnp.float32(lam0), jnp.asarray(False)),
        jnp.arange(iters),
    )
    r, pc, _, _ = _ba_residuals(T_cw, p.K, points, p)
    chi2 = jnp.sum(r * r, -1) / p.obs_sigma2
    inlier = p.obs_valid & (chi2 <= chi2_e) & (pc[:, 2] > 1e-3)
    final_cost = _ba_cost_from_residual(r, pc, p, p.obs_valid, chi2_e)
    return BAResult(T_cw=T_cw, points=points, obs_inlier=inlier, cost=final_cost)


# ---------------------------------------------------------------------------
# Window-structured BA (scatter-free: the local-mapping hot path)
# ---------------------------------------------------------------------------

class WindowBAResult(NamedTuple):
    T_cw: jax.Array  # [W,4,4]
    points: jax.Array  # [P,3]
    obs_inlier: jax.Array  # [W,M]
    cost: jax.Array


def _inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form (adjugate) 3x3 inverse.

    ``jnp.linalg.inv`` on a [P,3,3] batch lowers to batched LU (~7 ms at
    P=8192 on a v5e); the cofactor formula is ~50 VPU flops per matrix and
    fuses into the surrounding program. Callers damp the diagonal first, so
    det > 0 is guaranteed."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co10, co11, co12], -1),
            jnp.stack([co20, co21, co22], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def _window_incidence(obs_point, obs_valid, P: int):
    """[W,P] feature-slot lookup: idx[w,p] = which of camera w's M features
    observes point p (M = none). A keyframe observes a landmark at most
    once, so the table is exact — and it turns every per-point reduction in
    the LM loop into a GATHER. Computed as a streaming compare+min-reduce:
    binary search (searchsorted) costs ~20 ms per vmap'd call on a v5e
    (13 serial irregular-gather rounds), while the [W,M,P] equality compare
    fuses into a sub-ms VPU reduction. Built once per BA call."""
    W, M = obs_point.shape
    key = jnp.where(obs_valid, obs_point, P)
    pids = jnp.arange(P, dtype=key.dtype)
    hit = key[:, :, None] == pids[None, None, :]  # [W,M,P], fused reduce
    marr = jnp.arange(M, dtype=jnp.int32)
    idx = jnp.min(jnp.where(hit, marr[None, :, None], M), axis=1)  # [W,P]
    return idx, idx < M


def bundle_adjust_window(
    T_cw: jax.Array,  # [W,4,4]
    K: jax.Array,  # [W,3,3]
    cam_valid: jax.Array,  # [W]
    cam_fixed: jax.Array,  # [W]
    points: jax.Array,  # [P,3]
    point_valid: jax.Array,  # [P]
    obs_point: jax.Array,  # [W,M] int32 point index per camera feature
    obs_uv: jax.Array,  # [W,M,2]
    obs_sigma2: jax.Array,  # [W,M]
    obs_valid: jax.Array,  # [W,M]
    iters: int = 8,
    chi2_th: float = CHI2_MONO,
    lam0: float = 1e-4,
    obs_ur: jax.Array | None = None,  # [W,M]
    bf: jax.Array | None = None,  # [W]
) -> WindowBAResult:
    """Schur-complement LM for a covisibility WINDOW, fully scatter-free.

    Same math as ``bundle_adjust`` (reference LocalBundleAdjustment,
    Optimizer.cc:475) but exploits the window's [W,M] observation layout:
    camera-block reductions are plain einsums over each camera's own
    features, and point-block reductions go through the [W,P] incidence
    gather (see _window_incidence) — no scatter anywhere in the LM loop.
    """
    W, M = obs_point.shape
    P = points.shape[0]
    chi2_e = chi2_th if obs_ur is None else jnp.where(
        obs_ur >= 0.0, CHI2_STEREO, chi2_th
    )
    idx_wp, has_wp = _window_incidence(obs_point, obs_valid, P)

    def gather_wp(X):
        """[W,M,F] -> [W,P,F], zero where camera w does not observe p."""
        Xp = jnp.concatenate([X, jnp.zeros_like(X[:, :1])], axis=1)
        return jnp.take_along_axis(Xp, idx_wp[:, :, None], axis=1)

    pt_of = jnp.clip(obs_point, 0, P - 1)
    free = ~cam_fixed

    def residual(T_all, pts):
        pw = pts[pt_of]  # [W,M,3]
        R, t = T_all[:, :3, :3], T_all[:, :3, 3]
        pc = jnp.einsum("wij,wmj->wmi", R, pw) + t[:, None, :]
        z = jnp.maximum(pc[..., 2], 1e-6)
        fx = K[:, 0, 0][:, None]
        fy = K[:, 1, 1][:, None]
        cx = K[:, 0, 2][:, None]
        cy = K[:, 1, 2][:, None]
        u = fx * pc[..., 0] / z + cx
        v = fy * pc[..., 1] / z + cy
        r = jnp.stack([u, v], -1) - obs_uv
        if obs_ur is not None:
            r3 = (u - bf[:, None] / z - obs_ur) * (obs_ur >= 0.0)
            r = jnp.concatenate([r, r3[..., None]], -1)
        return r, pc

    def jacobians(pc, T_all):
        fx = K[:, 0, 0][:, None]
        fy = K[:, 1, 1][:, None]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        zi2 = zi * zi
        zero = jnp.zeros_like(x)
        du = jnp.stack([fx * zi, zero, -fx * x * zi2], -1)
        dv = jnp.stack([zero, fy * zi, -fy * y * zi2], -1)
        rows = [du, dv]
        if obs_ur is not None:
            has = (obs_ur >= 0.0).astype(pc.dtype)
            dur = jnp.stack(
                [fx * zi, zero, -fx * x * zi2 + bf[:, None] * zi2], -1
            )
            rows.append(dur * has[..., None])
        dpd = jnp.stack(rows, -2)  # [W,M,D,3]
        px = geo.skew(pc)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), px.shape)
        Jc = dpd @ jnp.concatenate([eye, -px], -1)  # [W,M,D,6]
        Jp = dpd @ T_all[:, None, :3, :3]  # [W,M,D,3]
        return Jc, Jp

    def cost_of(r, pc, use):
        chi2 = jnp.sum(r * r, -1) / obs_sigma2
        hub = jnp.where(
            chi2 <= chi2_e, chi2, 2.0 * jnp.sqrt(chi2_e * chi2) - chi2_e
        )
        return jnp.sum(jnp.where(use & (pc[..., 2] > 1e-3), hub, 0.0))

    base_use = obs_valid & cam_valid[:, None] & point_valid[pt_of]

    def step_body(carry):
        T_all, pts, lam, _ = carry
        r, pc = residual(T_all, pts)
        use = base_use & (pc[..., 2] > 1e-3)
        rn = jnp.linalg.norm(r, axis=-1)
        delta = jnp.sqrt(chi2_e * obs_sigma2)
        w = jnp.where(rn > delta, delta / jnp.maximum(rn, 1e-9), 1.0) / obs_sigma2
        w = jnp.where(use, w, 0.0)
        Jc, Jp = jacobians(pc, T_all)
        Jc = Jc * free[:, None, None, None]
        wJc = Jc * w[..., None, None]
        wJp = Jp * w[..., None, None]

        # camera blocks: plain per-camera reductions over the M axis
        Hcc = jnp.einsum("wmia,wmib->wab", wJc, Jc)
        gc = jnp.einsum("wmia,wmi->wa", wJc, r)
        # point blocks + camera-point coupling: ONE fused incidence gather
        # for all four per-point tensors (Hpp 9 + gp 3 + Wcp 18 + w 1 lanes)
        opp = jnp.einsum("wmia,wmib->wmab", wJp, Jp).reshape(W, M, 9)
        gp_ = jnp.einsum("wmia,wmi->wma", wJp, r)
        ocp = jnp.einsum("wmia,wmib->wmab", wJc, Jp).reshape(W, M, 18)
        packed = jnp.concatenate([opp, gp_, ocp, w[..., None]], axis=-1)
        G = gather_wp(packed)  # [W,P,31]
        Hpp = G[..., 0:9].sum(0).reshape(P, 3, 3)
        gp = G[..., 9:12].sum(0)  # [P,3]
        Wd = G[..., 12:30].reshape(W, P, 6, 3)

        Hcc_d = Hcc + ((lam + 1e-5) * jnp.eye(6))[None] * jnp.maximum(
            jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0
        )
        Hpp_d = Hpp + ((lam + 1e-5) * jnp.eye(3))[None] * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
        )
        w_per_pt = G[..., 30].sum(0)
        observed = w_per_pt > 1e-9
        Hpp_d = jnp.where(observed[:, None, None], Hpp_d, jnp.eye(3)[None])
        Hpp_inv = _inv3x3(Hpp_d)

        WHinv = jnp.einsum("wpab,pbd->wpad", Wd, Hpp_inv)
        S = jnp.einsum("wpad,vpbd->wvab", WHinv, Wd)
        Sfull = -S
        Sfull = Sfull.at[jnp.arange(W), jnp.arange(W)].add(Hcc_d)
        rhs = gc - jnp.einsum("wpad,pd->wa", WHinv, gp)
        Smat = Sfull.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
        lock = cam_fixed | ~cam_valid
        lockv = jnp.repeat(lock, 6)
        Smat = jnp.where(lockv[:, None] | lockv[None, :], jnp.eye(W * 6), Smat)
        rhsv = jnp.where(lockv, 0.0, rhs.reshape(-1))
        dc = -jnp.linalg.solve(Smat, rhsv).reshape(W, 6)
        Wt_dc = jnp.einsum("wpab,wa->pb", Wd, dc)
        dp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + Wt_dc)
        dp = dp * (point_valid & observed)[:, None]

        T_new = jax.vmap(lambda d, T: geo.se3_exp(d) @ T)(dc, T_all)
        T_new = jnp.where(lock[:, None, None], T_all, T_new)
        pts_new = pts + dp

        c_old = cost_of(r, pc, base_use)
        r2_, pc2_ = residual(T_new, pts_new)
        c_new = cost_of(r2_, pc2_, base_use)
        finite = (
            jnp.isfinite(c_new)
            & jnp.isfinite(T_new).all()
            & jnp.isfinite(pts_new).all()
        )
        better = (c_new < c_old) & finite
        T_all = jnp.where(better, T_new, T_all)
        pts = jnp.where(better, pts_new, pts)
        lam = jnp.where(
            better, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 5.0, 1e3)
        )
        step_sq = jnp.sum(dc * dc) + jnp.sum(dp * dp)
        done = (
            better & (c_old - c_new <= 1e-5 * c_old) & (step_sq < 1e-10)
        ) | (~better & (lam >= 1e3))
        return (T_all, pts, lam, done)

    def step(carry, _):
        return jax.lax.cond(carry[3], lambda c: c, step_body, carry), None

    (T_all, pts, _, _), _ = jax.lax.scan(
        step, (T_cw, points, jnp.float32(lam0), jnp.asarray(False)),
        None, length=iters,
    )
    r, pc = residual(T_all, pts)
    chi2 = jnp.sum(r * r, -1) / obs_sigma2
    inlier = obs_valid & (chi2 <= chi2_e) & (pc[..., 2] > 1e-3)
    final_cost = cost_of(r, pc, base_use)
    return WindowBAResult(T_cw=T_all, points=pts, obs_inlier=inlier,
                          cost=final_cost)


# ---------------------------------------------------------------------------
# Sim3 pose-graph optimization (essential graph)
# ---------------------------------------------------------------------------

class PoseGraphProblem(NamedTuple):
    """Sim3 pose graph (reference Optimizer::(MM)OptimizeEssentialGraph,
    Optimizer.cc:803/:1068): nodes are keyframe Sim3 poses (world→KF), edges
    are relative Sim3 measurements from the spanning tree / covisibility /
    loop closures. Monocular scale drift is absorbed by the 7th DoF."""

    S_iw: jax.Array  # [C,8] packed sim3 node poses (node-from-world)
    node_valid: jax.Array  # [C]
    node_fixed: jax.Array  # [C] — the loop/anchor KF(s)
    edge_i: jax.Array  # [E] int32
    edge_j: jax.Array  # [E] int32
    edge_Sij: jax.Array  # [E,8] measured S_i ∘ S_j^-1
    edge_valid: jax.Array  # [E]
    edge_weight: jax.Array  # [E] information scale


def _pg_residual(S_i, S_j, M_ij):
    """r = log(M_ij ∘ S_j ∘ S_i^-1): zero when S_i ∘ S_j^-1 == M_ij."""
    return geo.sim3_log(geo.sim3_compose(M_ij, geo.sim3_compose(S_j, geo.sim3_inv(S_i))))


def pose_graph_optimize(
    p: PoseGraphProblem, iters: int = 20, lam0: float = 1e-4,
    cg_iters: int = 50,
) -> jax.Array:
    """MATRIX-FREE LM over the Sim3 pose graph. Returns optimized S_iw [C,8].

    Jacobians are exact via per-edge forward-mode autodiff (14 tangent dims
    per edge). The normal equations are never assembled: H·x is three
    edge-wise segment ops ([E,7,7] blocks only), solved by preconditioned
    CG with a block-Jacobi preconditioner from the exact node-diagonal
    blocks. Memory is O(E·49) instead of the dense [7C,7C] — this is what
    lets ``correct_loop`` run per loop closure on KITTI-00-scale maps
    (C >= 1024, reference Optimizer.cc:1068 scale) inside the chunk budget.
    """
    C = p.S_iw.shape[0]
    E = p.edge_i.shape[0]

    def edge_r(xi_i, xi_j, S_i, S_j, M):
        return _pg_residual(
            geo.sim3_compose(geo.sim3_exp(xi_i), S_i),
            geo.sim3_compose(geo.sim3_exp(xi_j), S_j),
            M,
        )

    jac = jax.vmap(jax.jacfwd(edge_r, argnums=(0, 1)), in_axes=(0, 0, 0, 0, 0))
    res_f = jax.vmap(edge_r, in_axes=(0, 0, 0, 0, 0))
    lock = p.node_fixed | ~p.node_valid

    def total_cost(S):
        r = res_f(
            jnp.zeros((E, 7)),
            jnp.zeros((E, 7)),
            S[p.edge_i],
            S[p.edge_j],
            p.edge_Sij,
        )
        w = jnp.where(p.edge_valid, p.edge_weight, 0.0)
        return jnp.sum(w * jnp.sum(r * r, -1))

    def step(carry, _):
        S, lam = carry
        Si = S[p.edge_i]
        Sj = S[p.edge_j]
        zeros = jnp.zeros((E, 7))
        r = res_f(zeros, zeros, Si, Sj, p.edge_Sij)  # [E,7]
        Ji, Jj = jac(zeros, zeros, Si, Sj, p.edge_Sij)  # [E,7,7] each
        w = jnp.where(p.edge_valid, p.edge_weight, 0.0)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        # gradient + exact node-diagonal blocks (edge-wise scatter)
        g = jnp.zeros((C, 7))
        g = g.at[p.edge_i].add(jnp.einsum("eia,ei->ea", wJi, r))
        g = g.at[p.edge_j].add(jnp.einsum("eia,ei->ea", wJj, r))
        Hd = jnp.zeros((C, 7, 7))
        Hd = Hd.at[p.edge_i].add(jnp.einsum("eia,eib->eab", wJi, Ji))
        Hd = Hd.at[p.edge_j].add(jnp.einsum("eia,eib->eab", wJj, Jj))
        # LM damping on the diagonal blocks
        dscale = jnp.maximum(
            jnp.diagonal(Hd, axis1=-2, axis2=-1), 1.0
        )  # [C,7]
        damp = (lam + 1e-6) * dscale

        def mv(x):  # [C,7] -> (H + damp) x with locked rows as identity
            xi = x[p.edge_i]
            xj = x[p.edge_j]
            y = jnp.einsum("eab,eb->ea", Ji, xi) + jnp.einsum(
                "eab,eb->ea", Jj, xj
            )  # [E,7] J x
            out = jnp.zeros((C, 7))
            out = out.at[p.edge_i].add(jnp.einsum("eab,ea->eb", wJi, y))
            out = out.at[p.edge_j].add(jnp.einsum("eab,ea->eb", wJj, y))
            out = out + damp * x
            return jnp.where(lock[:, None], x, out)

        Hd_damped = Hd + jax.vmap(jnp.diag)(damp)
        Hd_damped = jnp.where(lock[:, None, None], jnp.eye(7)[None], Hd_damped)
        Minv = jnp.linalg.inv(Hd_damped + 1e-8 * jnp.eye(7)[None])

        def precond(v):
            return jnp.einsum("cab,cb->ca", Minv, v)

        rhs = jnp.where(lock[:, None], 0.0, -g)

        def cg_body(carry, _):
            x, rr, pv, rz = carry
            Ap = mv(pv)
            alpha = rz / jnp.maximum(jnp.vdot(pv, Ap), 1e-12)
            x = x + alpha * pv
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.vdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            pv = z + beta * pv
            return (x, rr, pv, rz_new), None

        x0 = jnp.zeros((C, 7))
        z0 = precond(rhs)
        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs, z0, jnp.vdot(rhs, z0)), None, length=cg_iters
        )
        dx = jnp.where(lock[:, None], 0.0, dx)
        S_new = jax.vmap(lambda d, s: geo.sim3_compose(geo.sim3_exp(d), s))(dx, S)
        S_new = jnp.where(lock[:, None], S, S_new)
        c_old = total_cost(S)
        c_new = total_cost(S_new)
        better = (c_new < c_old) & jnp.isfinite(c_new)
        S = jnp.where(better, S_new, S)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-7), jnp.minimum(lam * 5.0, 1e4))
        return (S, lam), c_new

    (S, _), _ = jax.lax.scan(step, (p.S_iw, jnp.float32(lam0)), None, length=iters)
    return S


class Sim3RefineResult(NamedTuple):
    S: jax.Array  # [8] refined packed Sim3 (frame-1 points → frame-2 coords)
    inliers: jax.Array  # [N] bool — both-direction chi2 survivors
    n_inliers: jax.Array  # int32


def sim3_refine(
    S21: jax.Array,
    pts1: jax.Array,  # [N,3] matched points in camera-1 coordinates
    pts2: jax.Array,  # [N,3] matched points in camera-2 coordinates
    valid: jax.Array,  # [N] match mask
    K1: jax.Array,
    K2: jax.Array,
    sigma2: jax.Array | float = 1.0,
    iters: int = 8,
    chi2_th: float = 10.0,  # reference OptimizeSim3 th2 (Optimizer.cc:1451)
    fix_scale: bool = False,
) -> Sim3RefineResult:
    """Nonlinear Sim3 refinement with BIDIRECTIONAL projection edges — the
    reference Optimizer::OptimizeSim3 analog (Optimizer.cc:1349-1540):
    each correspondence contributes a forward edge (point 1 projected
    through S21 into image 2) and a backward edge (point 2 through S21^-1
    into image 1), both Huber-robustified; Gauss-Newton on the 7-DoF tangent
    (6-DoF when ``fix_scale``, the stereo/RGB-D mode of Sim3Solver.cc:24).
    Inliers are correspondences whose BOTH edges pass ``chi2_th`` at the
    refined transform (the reference prunes the same way, :1468-1489)."""
    sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, jnp.float32), valid.shape)
    inv_s2 = 1.0 / sigma2
    uv1 = geo.project(K1, pts1)
    uv2 = geo.project(K2, pts2)
    delta = jnp.sqrt(chi2_th)

    def residuals(S):
        p12 = geo.sim3_apply(S, pts1)
        r_f = geo.project(K2, p12) - uv2  # [N,2]
        p21 = geo.sim3_apply(geo.sim3_inv(S), pts2)
        r_b = geo.project(K1, p21) - uv1  # [N,2]
        return r_f, r_b, p12[..., 2], p21[..., 2]

    def step(carry, _):
        S, lam = carry

        def r_of(xi):
            Sx = geo.sim3_compose(geo.sim3_exp(xi), S)
            r_f, r_b, _, _ = residuals(Sx)
            return jnp.concatenate([r_f, r_b], axis=-1)  # [N,4]

        zero = jnp.zeros((7,))
        r = r_of(zero)
        J = jax.jacfwd(r_of)(zero)  # [N,4,7]
        if fix_scale:
            J = J.at[..., 6].set(0.0)
        r_f, r_b, z_f, z_b = residuals(S)
        use = valid & (z_f > 1e-3) & (z_b > 1e-3)
        # independent Huber weight per direction (two g2o edges per match);
        # residuals far beyond the Huber zone are TRUNCATED — gross outliers
        # near the image plane carry enormous Jacobians that linear Huber
        # downweighting cannot tame (the reference prunes such edges between
        # its two optimize(5) passes, Optimizer.cc:1468-1489)
        nf = jnp.sqrt(jnp.sum(r_f * r_f, -1) * inv_s2 + 1e-12)
        nb = jnp.sqrt(jnp.sum(r_b * r_b, -1) * inv_s2 + 1e-12)
        w_f = jnp.where(nf > delta, delta / nf, 1.0) * inv_s2
        w_b = jnp.where(nb > delta, delta / nb, 1.0) * inv_s2
        w_f = jnp.where(nf > 6.0 * delta, 0.0, w_f)
        w_b = jnp.where(nb > 6.0 * delta, 0.0, w_b)
        w4 = jnp.concatenate(
            [jnp.stack([w_f, w_f], -1), jnp.stack([w_b, w_b], -1)], -1
        ) * use[:, None]  # [N,4]
        Jw = J * w4[..., None]
        H = jnp.einsum("nia,nib->ab", Jw, J) + 1e-6 * jnp.eye(7)
        g = jnp.einsum("nia,ni->a", Jw, r)
        H = H + lam * jnp.diag(jnp.diag(H))
        if fix_scale:
            H = H.at[6, 6].set(1.0)
        dx = -jnp.linalg.solve(H, g)
        if fix_scale:
            dx = dx.at[6].set(0.0)
        S_new = geo.sim3_compose(geo.sim3_exp(dx), S)

        def cost(S_):
            rf, rb, zf, zb = residuals(S_)
            c2f = jnp.sum(rf * rf, -1) * inv_s2
            c2b = jnp.sum(rb * rb, -1) * inv_s2
            cap = 36.0 * chi2_th  # truncation radius (matches the weights)

            def hub(c2):
                h = jnp.where(
                    c2 <= chi2_th, c2, 2.0 * delta * jnp.sqrt(c2) - chi2_th
                )
                return jnp.minimum(h, 2.0 * delta * jnp.sqrt(cap) - chi2_th)

            ok = valid & (zf > 1e-3) & (zb > 1e-3)
            return jnp.sum(jnp.where(ok, hub(c2f) + hub(c2b), 0.0))

        better = (cost(S_new) < cost(S)) & jnp.isfinite(S_new).all()
        S = jnp.where(better, S_new, S)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-7),
                        jnp.minimum(lam * 5.0, 1e4))
        return (S, lam), None

    (S, _), _ = jax.lax.scan(
        step, (S21, jnp.float32(1e-4)), None, length=iters
    )
    r_f, r_b, z_f, z_b = residuals(S)
    c2f = jnp.sum(r_f * r_f, -1) * inv_s2
    c2b = jnp.sum(r_b * r_b, -1) * inv_s2
    inl = valid & (c2f < chi2_th) & (c2b < chi2_th) & (z_f > 1e-3) & (z_b > 1e-3)
    return Sim3RefineResult(S=S, inliers=inl,
                            n_inliers=inl.sum().astype(jnp.int32))


def _make_sorted_segsum(ids: jax.Array, n_seg: int):
    """Edge→node segment sum WITHOUT scatter: sort once (the permutation is
    a pure function of the static edge list), then every reduction is
    gather → cumsum → two boundary gathers. MEASURED on the v5e relay this
    is ~15% SLOWER than the scatter form at E=262k (both are dominated by
    irregular memory traffic), and the sequential cumsum SERIALIZES across
    devices when the edge axis is sharded (kf-sharded GBA efficiency
    1.0 → 0.23 measured) — so the scatter form stays the default; this is
    kept for single-device experimentation. The running sum is carried in
    f64 (where enabled) so boundary differences of a long cumsum don't
    cancel catastrophically."""
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    idx = jnp.arange(n_seg, dtype=ids.dtype)
    start = jnp.searchsorted(sorted_ids, idx, side="left")
    end = jnp.searchsorted(sorted_ids, idx, side="right")

    def segsum(vals: jax.Array) -> jax.Array:  # [E, ...] -> [n_seg, ...]
        v = vals[order].astype(jnp.float64)
        cz = jnp.concatenate(
            [jnp.zeros_like(v[:1]), jnp.cumsum(v, axis=0)], axis=0
        )
        return (cz[end] - cz[start]).astype(vals.dtype)

    return segsum


def bundle_adjust_cg(
    p: BAProblem,
    iters: int = 10,
    cg_iters: int = 30,
    chi2_th: float = CHI2_MONO,
    lam0: float = 1e-4,
    segsum: str = "scatter",
) -> BAResult:
    """LM bundle adjustment with a MATRIX-FREE Schur solve (PCG).

    Same math as ``bundle_adjust`` but the reduced camera system is solved
    by preconditioned conjugate gradients whose matrix-vector product is
    three edge-wise segment ops — no [C,P] tensor is ever materialized, so
    this scales to full-map global BA (reference RunGlobalBundleAdjustment)
    and shards over devices along the edge axis.
    Block-Jacobi preconditioner from the exact Schur diagonal blocks.
    ``segsum``: "scatter" (default — shards cleanly over the edge axis) or
    "sorted" (single-device sorted-cumsum variant, see _make_sorted_segsum).
    """
    C = p.T_cw.shape[0]
    Pn = p.points.shape[0]
    chi2_e = _chi2_per_edge(p, chi2_th)
    if segsum == "sorted":
        seg_cam = _make_sorted_segsum(p.obs_cam, C)
        seg_pt = _make_sorted_segsum(p.obs_point, Pn)
    else:
        def seg_cam(v):
            return jnp.zeros((C,) + v.shape[1:], v.dtype).at[p.obs_cam].add(v)

        def seg_pt(v):
            return jnp.zeros((Pn,) + v.shape[1:], v.dtype).at[p.obs_point].add(v)

    def step(carry, _):
        T_cw, points, lam = carry
        r, pc, Tc, Kc = _ba_residuals(T_cw, K=p.K, points=points, p=p)
        use = p.obs_valid & (pc[:, 2] > 1e-3) \
            & p.cam_valid[p.obs_cam] & p.point_valid[p.obs_point]
        w = _robust_weights(r, p.obs_sigma2, use, chi2_e)
        Jc, Jp = _ba_jacobians(Kc, Tc, pc, p)
        free = ~p.cam_fixed
        Jc = Jc * free[p.obs_cam][:, None, None]
        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]
        Hcc = seg_cam(jnp.einsum("eia,eib->eab", wJc, Jc))
        Hpp = seg_pt(jnp.einsum("eia,eib->eab", wJp, Jp))
        gc = seg_cam(jnp.einsum("eia,ei->ea", wJc, r))
        gp = seg_pt(jnp.einsum("eia,ei->ea", wJp, r))
        Hcc_d = Hcc + ((lam + 1e-5) * jnp.eye(6))[None] * jnp.maximum(
            jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0
        )
        Hpp_d = Hpp + ((lam + 1e-5) * jnp.eye(3))[None] * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
        )
        w_per_pt = seg_pt(w)
        observed = w_per_pt > 1e-9
        Hpp_d = jnp.where(observed[:, None, None], Hpp_d, jnp.eye(3)[None])
        Hpp_inv = _inv3x3(Hpp_d)

        Wcp = jnp.einsum("eia,eib->eab", wJc, Jp)  # [E,6,3] per-edge camera-point block

        def schur_mv(x):  # x [C,6] -> S x
            xt = x[p.obs_cam]  # [E,6]
            y = seg_pt(jnp.einsum("eab,ea->eb", Wcp, xt))
            z = jnp.einsum("pab,pb->pa", Hpp_inv, y)
            back = seg_cam(jnp.einsum("eab,eb->ea", Wcp, z[p.obs_point]))
            return jnp.einsum("cab,cb->ca", Hcc_d, x) - back

        # exact Schur diagonal blocks for block-Jacobi preconditioning
        Sdiag_sub = seg_cam(
            jnp.einsum("eab,ebd,ecd->eac", Wcp, Hpp_inv[p.obs_point], Wcp)
        )
        Sdiag = Hcc_d - Sdiag_sub
        lock = p.cam_fixed | ~p.cam_valid
        Sdiag = jnp.where(lock[:, None, None], jnp.eye(6)[None], Sdiag)
        Minv = jnp.linalg.inv(Sdiag + 1e-6 * jnp.eye(6)[None])

        # rhs = -(gc - W Hpp^-1 gp)
        zp = jnp.einsum("pab,pb->pa", Hpp_inv, gp)
        red = seg_cam(jnp.einsum("eab,eb->ea", Wcp, zp[p.obs_point]))
        rhs = -(gc - red)
        rhs = jnp.where(lock[:, None], 0.0, rhs)

        def precond(v):
            return jnp.einsum("cab,cb->ca", Minv, v)

        def cg_body(carry, _):
            x, rr, pvec, rz = carry
            Ap = schur_mv(pvec)
            Ap = jnp.where(lock[:, None], pvec, Ap)
            alpha = rz / jnp.maximum(jnp.vdot(pvec, Ap), 1e-12)
            x = x + alpha * pvec
            rr = rr - alpha * Ap
            znew = precond(rr)
            rz_new = jnp.vdot(rr, znew)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            pvec = znew + beta * pvec
            return (x, rr, pvec, rz_new), None

        x0 = jnp.zeros((C, 6))
        r0 = rhs
        z0 = precond(r0)
        (dc, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, jnp.vdot(r0, z0)), None, length=cg_iters
        )
        dc = jnp.where(lock[:, None], 0.0, dc)
        # back-substitute points
        wt = seg_pt(jnp.einsum("eab,ea->eb", Wcp, dc[p.obs_cam]))
        dp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + wt)
        dp = dp * (p.point_valid & observed)[:, None]

        T_new = jax.vmap(lambda d, T: geo.se3_exp(d) @ T)(dc, T_cw)
        T_new = jnp.where(lock[:, None, None], T_cw, T_new)
        pts_new = points + dp
        c_old = _ba_cost(T_cw, p.K, points, p, p.obs_valid, chi2_e)
        c_new = _ba_cost(T_new, p.K, pts_new, p, p.obs_valid, chi2_e)
        finite = jnp.isfinite(c_new) & jnp.isfinite(T_new).all() & jnp.isfinite(pts_new).all()
        better = (c_new < c_old) & finite
        T_cw = jnp.where(better, T_new, T_cw)
        points = jnp.where(better, pts_new, points)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 5.0, 1e3))
        return (T_cw, points, lam), c_new

    (T_cw, points, _), costs = jax.lax.scan(
        step, (p.T_cw, p.points, jnp.float32(lam0)), None, length=iters
    )
    r, pc, _, _ = _ba_residuals(T_cw, p.K, points, p)
    chi2 = jnp.sum(r * r, -1) / p.obs_sigma2
    inlier = p.obs_valid & (chi2 <= chi2_e) & (pc[:, 2] > 1e-3)
    return BAResult(T_cw=T_cw, points=points, obs_inlier=inlier, cost=costs[-1])
