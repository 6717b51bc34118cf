import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.ops import ba, geometry as geo


def ring_problem(n=12, drift_rot=0.02, drift_scale=1.015, seed=0,
                 covis_skips=()):
    """Odometry ring with per-step scale drift + one loop-closure edge.

    The classic monocular pose-graph scenario: accumulated drift makes the
    last node disagree with the first; the loop edge (with the TRUE relative
    pose) must pull the whole ring consistent — including the 7th (scale)
    DoF, which an SE3 graph could not fix.
    """
    rng = np.random.default_rng(seed)
    # ground truth: nodes on a circle
    S_gt = np.zeros((n, 8), np.float32)
    for i in range(n):
        ang = 2 * np.pi * i / n
        R = np.asarray(geo.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        C = np.array([5 * np.sin(ang), 0.0, 5 - 5 * np.cos(ang)], np.float32)
        t = -R @ C
        S_gt[i] = np.asarray(geo.sim3_make(jnp.float32(1.0), jnp.asarray(R), jnp.asarray(t)))
    S_gt = jnp.asarray(S_gt)

    # odometry measurements corrupted by drift
    edges_i, edges_j, S_meas = [], [], []
    S_est = [np.asarray(S_gt[0])]
    for i in range(1, n):
        M_true = geo.sim3_compose(S_gt[i], geo.sim3_inv(S_gt[i - 1]))  # S_i∘S_{i-1}^-1
        noise = geo.sim3_exp(
            jnp.asarray(
                np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, drift_rot, 3),
                                [np.log(drift_scale)]]), jnp.float32)
        )
        M_drift = geo.sim3_compose(noise, M_true)
        edges_i.append(i)
        edges_j.append(i - 1)
        S_meas.append(np.asarray(M_drift))
        S_est.append(np.asarray(geo.sim3_compose(M_drift, jnp.asarray(S_est[-1]))))
    # covisibility-style skip edges (every real essential graph has them:
    # strong-covisibility pairs, Optimizer.cc:1110) — measured from the
    # DRIFTED odometry chain so they are consistent with it
    S_est_a = np.stack(S_est)
    for k in covis_skips:
        for i in range(k, n):
            M = geo.sim3_compose(
                jnp.asarray(S_est_a[i]),
                geo.sim3_inv(jnp.asarray(S_est_a[i - k])),
            )
            edges_i.append(i)
            edges_j.append(i - k)
            S_meas.append(np.asarray(M))
    # loop edge with the TRUE relative sim3 (loop closures are measured fresh)
    M_loop = geo.sim3_compose(S_gt[0], geo.sim3_inv(S_gt[n - 1]))
    edges_i.append(0)
    edges_j.append(n - 1)
    S_meas.append(np.asarray(M_loop))

    prob = ba.PoseGraphProblem(
        S_iw=jnp.asarray(np.stack(S_est)),
        node_valid=jnp.ones(n, bool),
        node_fixed=jnp.zeros(n, bool).at[0].set(True),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        edge_Sij=jnp.asarray(np.stack(S_meas)),
        edge_valid=jnp.ones(len(edges_i), bool),
        edge_weight=jnp.ones(len(edges_i), jnp.float32),
    )
    return prob, S_gt


def node_errors(S_est, S_gt):
    pos_err, scale_err = [], []
    for e, g in zip(np.asarray(S_est), np.asarray(S_gt)):
        se, Re, te = geo.sim3_parts(jnp.asarray(e))
        sg, Rg, tg = geo.sim3_parts(jnp.asarray(g))
        # camera centers
        Ce = -np.asarray(Re).T @ (np.asarray(te) / float(se))
        Cg = -np.asarray(Rg).T @ (np.asarray(tg) / float(sg))
        pos_err.append(np.linalg.norm(Ce - Cg))
        scale_err.append(abs(np.log(float(se) / float(sg))))
    return np.array(pos_err), np.array(scale_err)


def test_pose_graph_closes_drifted_loop():
    prob, S_gt = ring_problem()
    pos0, scale0 = node_errors(prob.S_iw, S_gt)
    assert pos0.max() > 0.5  # meaningful drift before optimization
    S_opt = ba.pose_graph_optimize(prob, iters=25)
    pos1, scale1 = node_errors(S_opt, S_gt)
    assert pos1.max() < pos0.max() * 0.35, f"{pos0.max()} -> {pos1.max()}"
    assert scale1.max() < 0.02, f"scale errors remain {scale1}"
    # fixed node untouched
    np.testing.assert_array_equal(np.asarray(S_opt[0]), np.asarray(prob.S_iw[0]))


def test_pose_graph_consistent_stays_put():
    prob, S_gt = ring_problem(drift_rot=0.0, drift_scale=1.0, seed=1)
    # measurements consistent: start AT ground truth (tiny odometry noise only)
    S_opt = ba.pose_graph_optimize(prob._replace(S_iw=S_gt), iters=10)
    pos, scale = node_errors(S_opt, S_gt)
    assert pos.max() < 0.05
    assert scale.max() < 0.01


def test_pose_graph_scales_to_kitti00_size():
    """The matrix-free solver must handle reference-scale essential graphs
    (KITTI-00-class: C >= 1024 nodes — dense [7C,7C] assembly would need
    ~200 MB and a 3.7e11-flop solve per LM iteration; the edge-wise CG
    formulation runs this in seconds)."""
    prob, S_gt = ring_problem(n=1024, drift_rot=0.004, drift_scale=1.0015,
                              seed=3, covis_skips=(2, 5))
    pos0, _ = node_errors(prob.S_iw, S_gt)
    assert pos0.max() > 0.5
    S_opt = ba.pose_graph_optimize(prob, iters=15, cg_iters=400)
    pos1, scale1 = node_errors(S_opt, S_gt)
    assert pos1.max() < pos0.max() * 0.35, f"{pos0.max()} -> {pos1.max()}"
    # cumulative drift is log(1.0015)*1024 ~ 1.54 in log-scale; residual
    # per-node log-scale error must come down two orders of magnitude
    assert scale1.max() < 0.08, f"scale errors remain {scale1.max()}"


def test_pose_graph_respects_masks():
    prob, S_gt = ring_problem()
    prob = prob._replace(edge_valid=prob.edge_valid.at[-1].set(False))  # no loop edge
    S_opt = ba.pose_graph_optimize(prob, iters=10)
    # without the loop edge the drifted chain is already consistent with its
    # odometry, so nodes should barely move
    d = np.abs(np.asarray(S_opt) - np.asarray(prob.S_iw)).max()
    assert d < 0.05
