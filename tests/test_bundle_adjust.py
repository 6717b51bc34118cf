import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.ops import ba, geometry as geo


def build_problem(
    n_cams=8, n_pts=300, noise=0.5, pose_noise=0.05, pt_noise=0.1, seed=0,
    outlier_frac=0.0,
):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    pts_gt = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
    pts_gt[:, 2] = rng.uniform(6, 14, n_pts)
    # cameras on a line with small rotations
    T_gt = np.zeros((n_cams, 4, 4), np.float32)
    for c in range(n_cams):
        xi = np.array(
            [0.4 * c, 0.02 * rng.normal(), 0.01 * rng.normal(),
             0.01 * rng.normal(), 0.02 * rng.normal(), 0.005 * rng.normal()],
            np.float32,
        )
        T_gt[c] = np.asarray(geo.se3_exp(jnp.asarray(xi)))
    # observations: every camera sees every point (capacity edge list)
    obs_cam, obs_pt, obs_uv, obs_ok = [], [], [], []
    for c in range(n_cams):
        pc = pts_gt @ T_gt[c, :3, :3].T + T_gt[c, :3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        uv += rng.normal(0, noise, uv.shape)
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        obs_cam.append(np.full(n_pts, c))
        obs_pt.append(np.arange(n_pts))
        obs_uv.append(uv)
        obs_ok.append(inb)
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    obs_ok = np.concatenate(obs_ok)
    if outlier_frac > 0:
        n_out = int(len(obs_uv) * outlier_frac)
        oi = rng.choice(len(obs_uv), n_out, replace=False)
        obs_uv[oi] = rng.uniform(0, [640, 480], (n_out, 2))
    # perturbed initial state (first camera is the gauge anchor)
    T_init = T_gt.copy()
    for c in range(1, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        T_init[c] = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ T_gt[c]
    pts_init = pts_gt + rng.normal(0, pt_noise, pts_gt.shape).astype(np.float32)

    prob = ba.BAProblem(
        T_cw=jnp.asarray(T_init),
        K=jnp.broadcast_to(jnp.asarray(K), (n_cams, 3, 3)),
        cam_valid=jnp.ones(n_cams, bool),
        cam_fixed=jnp.zeros(n_cams, bool).at[0].set(True),
        points=jnp.asarray(pts_init),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv),
        obs_sigma2=jnp.ones(len(obs_uv), jnp.float32),
        obs_valid=jnp.asarray(obs_ok),
    )
    return prob, T_gt, pts_gt


def pose_errors(T_est, T_gt):
    rot, tr = [], []
    for a, b in zip(np.asarray(T_est), T_gt):
        dR = a[:3, :3] @ b[:3, :3].T
        rot.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        tr.append(np.linalg.norm(a[:3, 3] - b[:3, 3]))
    return np.array(rot), np.array(tr)


def test_ba_converges_to_gt():
    prob, T_gt, pts_gt = build_problem()
    res = ba.bundle_adjust(prob, iters=15)
    rot, tr = pose_errors(res.T_cw, T_gt)
    assert rot.max() < 0.1, f"rot errors {rot}"
    assert tr.max() < 0.03, f"trans errors {tr}"
    perr = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(perr) < 0.15  # triangulation noise floor at sigma=0.5px
    # gauge: fixed camera untouched
    np.testing.assert_array_equal(np.asarray(res.T_cw[0]), np.asarray(prob.T_cw[0]))


def test_ba_reduces_cost_with_outliers():
    prob, T_gt, pts_gt = build_problem(outlier_frac=0.15, seed=3)
    res = ba.bundle_adjust(prob, iters=15)
    rot, tr = pose_errors(res.T_cw, T_gt)
    assert rot.max() < 0.5  # Huber (not hard-rejection) floor with 15% outliers
    assert tr.max() < 0.05
    # outlier classification at the end
    frac_in = float(res.obs_inlier.sum()) / float(prob.obs_valid.sum())
    assert 0.7 < frac_in < 0.95


def test_ba_respects_masks():
    prob, T_gt, pts_gt = build_problem(n_cams=6, n_pts=100)
    # invalidate last camera and last 20 points
    prob = prob._replace(
        cam_valid=prob.cam_valid.at[5].set(False),
        point_valid=prob.point_valid.at[80:].set(False),
    )
    res = ba.bundle_adjust(prob, iters=8)
    # invalid camera pose unchanged
    np.testing.assert_array_equal(np.asarray(res.T_cw[5]), np.asarray(prob.T_cw[5]))
    # invalid points unchanged
    np.testing.assert_array_equal(
        np.asarray(res.points[80:]), np.asarray(prob.points[80:])
    )
    rot, tr = pose_errors(res.T_cw[:5], T_gt[:5])
    assert rot.max() < 0.2


def test_ba_jit_compiles_once():
    prob, *_ = build_problem(n_cams=4, n_pts=50)
    f = jax.jit(lambda p: ba.bundle_adjust(p, iters=3))
    r1 = f(prob)
    r2 = f(prob._replace(points=prob.points + 0.01))
    assert np.isfinite(float(r1.cost)) and np.isfinite(float(r2.cost))


def test_ba_cg_matches_dense():
    """Matrix-free PCG Schur solve must reach the same optimum as the dense
    solve (the global-BA / distributed path)."""
    prob, T_gt, pts_gt = build_problem()
    dense = ba.bundle_adjust(prob, iters=12)
    cg = ba.bundle_adjust_cg(prob, iters=12, cg_iters=40)
    rot_d, tr_d = pose_errors(dense.T_cw, T_gt)
    rot_c, tr_c = pose_errors(cg.T_cw, T_gt)
    assert rot_c.max() < 0.15, f"cg rot {rot_c}"
    assert tr_c.max() < 0.04, f"cg tr {tr_c}"
    assert abs(float(cg.cost) - float(dense.cost)) / max(float(dense.cost), 1) < 0.2
