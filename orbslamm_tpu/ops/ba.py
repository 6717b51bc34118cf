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
  * ``pose_graph_optimize`` (sim3) — essential-graph optimization, added in a
    later milestone.

All functions are jit-safe with static capacities and validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.ops import geometry as geo

CHI2_MONO = 5.991  # 2-DoF 95% (reference Optimizer.cc chi2Mono)


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
    chi2_th: float = CHI2_MONO,
) -> PoseOptResult:
    """Motion-only bundle adjustment (reference Optimizer::PoseOptimization).

    pts_w [N,3] world landmarks, uv_obs [N,2] their measured pixels, valid
    [N] observation mask, sigma2 per-observation measurement variance
    (1.2^(2*octave) in the reference's pyramid noise model).
    """
    sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, jnp.float32), valid.shape)
    inv_s2 = 1.0 / sigma2
    delta_h = jnp.sqrt(chi2_th * sigma2)  # Huber threshold per obs (pixels)

    def lm_iter(carry, _):
        T, lam, mask = carry
        r, pc = _project_and_residual(T, K, pts_w, uv_obs)
        behind = pc[..., 2] < 1e-3
        use = mask & ~behind
        J = _pose_jacobian(K, pc)  # [N,2,6]
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
        # accept if robust cost decreased
        def cost(Tc):
            rr, pcc = _project_and_residual(Tc, K, pts_w, uv_obs)
            rrn2 = jnp.sum(rr * rr, axis=-1) * inv_s2
            hub = jnp.where(
                rrn2 <= chi2_th, rrn2, 2.0 * jnp.sqrt(chi2_th * rrn2) - chi2_th
            )
            return jnp.sum(jnp.where(mask & (pcc[..., 2] > 1e-3), hub, 0.0))

        c_old = cost(T)
        c_new = cost(T_new)
        better = c_new < c_old
        T = jnp.where(better, T_new, T)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4))
        return (T, lam, mask), None

    def chi2_mask(T):
        r, pc = _project_and_residual(T, K, pts_w, uv_obs)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        return valid & (chi2 <= chi2_th) & (pc[..., 2] > 1e-3)

    T = T_init
    mask = valid
    for _ in range(rounds):
        (T, _, _), _ = jax.lax.scan(lm_iter, (T, jnp.float32(1e-2), mask), None, length=iters)
        mask = chi2_mask(T)
    return PoseOptResult(T_cw=T, inliers=mask, n_inliers=mask.sum().astype(jnp.int32))
