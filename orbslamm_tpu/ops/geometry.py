"""Batched Lie-group / projective geometry core.

TPU-first design notes: every function here is shape-polymorphic over leading
batch axes, jit-safe (no data-dependent control flow), and float32 by default.
These replace the reference's Eigen/g2o scalar types (`se3quat.h`, `sim3.h`,
`Converter.cc`) with batched array math.

Conventions (match the reference, /root/reference/MultipleRobotsScenario):
  * Poses are camera-from-world rigid transforms ``Tcw`` stored as [..., 4, 4].
  * ``x_cam = R @ x_world + t``; pixel = K @ (x_cam / z).
  * Sim3 ``S = (s, R, t)`` acts as ``x' = s * R @ x + t`` (g2o sim3.h semantics).
  * Tangent ordering: se3 = [rho(3), phi(3)]; sim3 = [rho(3), phi(3), sigma].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# skew / SO3
# ---------------------------------------------------------------------------

def skew(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation.

    Taylor-safe near theta=0 so it is differentiable everywhere.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = skew(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation -> [..., 3] axis-angle with theta in [0, pi].

    Goes through the quaternion (Shepperd construction, accurate in every
    trace regime) then takes the quaternion log — robust near both 0 and pi.
    """
    q = rot_to_quat(R)  # (x, y, z, w), w >= 0 so theta <= pi
    v = q[..., :3]
    w = q[..., 3]
    nv = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(nv, w)
    small = nv < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(nv, _EPS))
    return scale[..., None] * v


def _so3_left_jacobian_terms(phi: jax.Array):
    """Coefficients for V = I + b W + c WW used by se3/sim3 exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    )
    return b, c


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array) -> jax.Array:
    """[..., 6] twist [rho, phi] -> [..., 4, 4] transform."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    b, c = _so3_left_jacobian_terms(phi)
    W = skew(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = (V @ rho[..., None])[..., 0]
    return rt_to_T(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 6] twist. Inverse of se3_exp."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    b, c = _so3_left_jacobian_terms(phi)
    W = skew(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """([...,3,3], [...,3]) -> [...,4,4] homogeneous transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def T_inv(T: jax.Array) -> jax.Array:
    """Fast inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [...,4,4] to [..., N, 3] (or [...,3]) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= 2 and pts.shape[-2:] != (3,):
        return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ pts[..., None])[..., 0] + t


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — TUM trajectory convention
# ---------------------------------------------------------------------------

def rot_to_quat(R: jax.Array) -> jax.Array:
    """[...,3,3] -> [...,4] quaternion (x,y,z,w), w >= 0.

    Branch-free Shepperd: compute all four candidate constructions, pick the
    numerically safest by weight.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    qw2 = jnp.clip(1.0 + m00 + m11 + m22, 0.0, None)
    qx2 = jnp.clip(1.0 + m00 - m11 - m22, 0.0, None)
    qy2 = jnp.clip(1.0 - m00 + m11 - m22, 0.0, None)
    qz2 = jnp.clip(1.0 - m00 - m11 + m22, 0.0, None)
    # candidates, each scaled by 2*sqrt(q?2)
    cw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2], axis=-1)
    cx = jnp.stack([qx2, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    cy = jnp.stack([m01 + m10, qy2, m12 + m21, m02 - m20], axis=-1)
    cz = jnp.stack([m02 + m20, m12 + m21, qz2, m10 - m01], axis=-1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [...,4,4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    return q * jnp.sign(q[..., 3:4] + _EPS)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """[...,4] (x,y,z,w) -> [...,3,3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# Sim3 — stored as [..., 8]: (quat xyzw, t xyz, log_s)
# ---------------------------------------------------------------------------

def sim3_make(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """(scale [...], rot [...,3,3], trans [...,3]) -> packed [...,8]."""
    return jnp.concatenate(
        [rot_to_quat(R), t, jnp.log(s)[..., None]], axis=-1
    )


def sim3_identity(batch: tuple = (), dtype=jnp.float32) -> jax.Array:
    q = jnp.broadcast_to(jnp.array([0, 0, 0, 1, 0, 0, 0, 0], dtype=dtype), batch + (8,))
    return q


def sim3_parts(S: jax.Array):
    """[...,8] -> (s [...], R [...,3,3], t [...,3])."""
    return jnp.exp(S[..., 7]), quat_to_rot(S[..., :4]), S[..., 4:7]


def sim3_apply(S: jax.Array, pts: jax.Array) -> jax.Array:
    """x' = s R x + t ; pts [..., N, 3] or [..., 3]."""
    s, R, t = sim3_parts(S)
    if pts.ndim >= 2 and pts.shape[-1] == 3 and pts.ndim > S.ndim:
        return s[..., None, None] * (pts @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]
    return s[..., None] * (R @ pts[..., None])[..., 0] + t


def sim3_compose(Sa: jax.Array, Sb: jax.Array) -> jax.Array:
    """S = Sa ∘ Sb (apply Sb first)."""
    sa, Ra, ta = sim3_parts(Sa)
    sb, Rb, tb = sim3_parts(Sb)
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    return sim3_make(s, R, t)


def sim3_inv(S: jax.Array) -> jax.Array:
    s, R, t = sim3_parts(S)
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    tinv = -sinv[..., None] * (Rt @ t[..., None])[..., 0]
    return sim3_make(sinv, Rt, tinv)


def sim3_from_se3(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return sim3_make(jnp.ones(T.shape[:-2], T.dtype), R, t)


def sim3_to_se3(S: jax.Array) -> jax.Array:
    """Drop scale into translation the way the reference does when mapping a
    corrected Sim3 back onto an SE3 keyframe pose (MultiMapper.cc:552-556:
    ``t / s`` then (R, t) as SE3)."""
    s, R, t = sim3_parts(S)
    return rt_to_T(R, t / s[..., None])


def sim3_exp(xi: jax.Array) -> jax.Array:
    """[...,7] tangent [rho, phi, sigma] -> packed Sim3 [...,8].

    Uses the closed-form sim3 V-matrix (Strasdat thesis) with series fallbacks.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = skew(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8
    # A = (s - 1)/sigma
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / (sigma + _EPS))
    denom = sig2 + theta2 + _EPS
    # B = (sigma*s*sin + (1 - s*cos)*theta)/(theta*(sig^2+theta^2))
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    B_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (theta * denom)
    B_small = jnp.where(
        small_sig, 0.5 - theta2 / 24.0, (sigma - 1.0 + s * (1 - sigma + sig2 / 2) ) / (sig2 + _EPS) + 0.5
    )
    # For theta->0 limit: B -> (s(1 - sigma) - 1 + sigma*s)/sig^2 ... use 1/2 * series
    B_theta0 = jnp.where(
        small_sig,
        0.5 + sigma / 3.0,
        (s * (sigma - 1.0) + 1.0) / (sig2 + _EPS),
    )
    B = jnp.where(small_th, B_theta0, B_gen)
    del B_small
    # C = ((A - (s*cos - 1)... ) closed form: C = (A - B_s)/theta^2 variant.
    # Use C = (A - ((s*cos - 1)*sigma + s*sin*theta)/denom)/theta^2 fallback via series
    C_gen = (A - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / (theta2 + _EPS)
    C_theta0 = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0, (A - (s * (1 + sigma) - 1 - sigma * s) / (sig2 + _EPS)) )
    # crude but adequate series floor for tiny theta
    C = jnp.where(small_th, jnp.maximum(C_theta0, 1.0 / 6.0), C_gen)
    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * WW
    t = (V @ rho[..., None])[..., 0]
    return sim3_make(s, R, t)


def sim3_log(S: jax.Array) -> jax.Array:
    """Packed Sim3 [...,8] -> [...,7] tangent. Numeric inverse of sim3_exp's V."""
    s, R, t = sim3_parts(S)
    sigma = jnp.log(s)
    phi = so3_log(R)
    # rebuild V from (phi, sigma) exactly as in sim3_exp, then solve
    xi_probe = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # reuse sim3_exp pieces by computing V via finite reconstruction:
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = skew(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / (sigma + _EPS))
    denom = sig2 + theta2 + _EPS
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    B_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (theta * denom)
    B_theta0 = jnp.where(small_sig, 0.5 + sigma / 3.0, (s * (sigma - 1.0) + 1.0) / (sig2 + _EPS))
    B = jnp.where(small_th, B_theta0, B_gen)
    C_gen = (A - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / (theta2 + _EPS)
    C_theta0 = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0, (A - (s * (1 + sigma) - 1 - sigma * s) / (sig2 + _EPS)))
    C = jnp.where(small_th, jnp.maximum(C_theta0, 1.0 / 6.0), C_gen)
    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * WW
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    del xi_probe
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Projection / triangulation
# ---------------------------------------------------------------------------

def project(K: jax.Array, pts_cam: jax.Array) -> jax.Array:
    """Pinhole projection. K [...,3,3] (or [3,3]); pts_cam [..., 3] -> [..., 2]."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = fx * pts_cam[..., 0] * inv_z + cx
    v = fy * pts_cam[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def backproject(K: jax.Array, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixel + depth -> camera-frame 3D point."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def triangulate_dlt(P1: jax.Array, P2: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Two-view linear (DLT) triangulation, batched over points.

    P1, P2: [..., 3, 4] projection matrices (K [R|t]); uv: [..., 2] pixels.
    Returns world points [..., 3]. Mirrors the contract of the reference's
    SVD triangulation (Initializer.cc Triangulate) but solves the 4x4 normal
    equations eigenproblem batched.
    """
    def rows(P, uv):
        r0 = uv[..., 0, None] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1, None] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # [...,4,4]
    # Null vector of A: smallest eigenvector of A^T A (symmetric 4x4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < _EPS, _EPS, w)
    return X[..., :3] / w[..., None]


def umeyama_alignment(src: jax.Array, dst: jax.Array, mask: jax.Array | None = None,
                      with_scale: bool = True):
    """Closed-form Sim3/SE3 alignment dst ≈ s R src + t (Umeyama / Horn).

    src, dst: [N, 3]; mask: [N] bool. Returns (s, R [3,3], t [3]).
    This is both the evaluation aligner (ATE) and the core of the Sim3 solver
    (reference Sim3Solver.cc:226 ComputeSim3, Horn 1987).
    """
    if mask is None:
        mask = jnp.ones(src.shape[:-1], dtype=bool)
    w = mask.astype(src.dtype)
    n = jnp.sum(w) + _EPS
    mu_s = jnp.sum(src * w[..., None], axis=0) / n
    mu_d = jnp.sum(dst * w[..., None], axis=0) / n
    sc = (src - mu_s) * w[..., None]
    dc = (dst - mu_d) * w[..., None]
    cov = dc.T @ (src - mu_s) / n  # [3,3] — note weights already on dc
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.sum(sc * (src - mu_s)) / n
    if with_scale:
        s = jnp.sum(D * jnp.diag(S)) / (var_s + _EPS)
    else:
        s = jnp.ones((), dtype=src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t
