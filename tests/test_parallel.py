"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates the SPMD story (parallel/dist_ba.py): edge-sharded distributed
bundle adjustment matches the single-device result, and robot-parallel
feature extraction shards its stream axis. The driver's dryrun_multichip
runs the same paths at scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orbslamm_tpu.ops import ba
from orbslamm_tpu.parallel import dist_ba


def build_problem(n_cams=6, n_pts=200, n_edges=1024, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)
    pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 9
    T = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    for c in range(n_cams):
        T[c, 0, 3] = 0.35 * c
    oc = rng.integers(0, n_cams, n_edges).astype(np.int32)
    op = rng.integers(0, n_pts, n_edges).astype(np.int32)
    pc = np.einsum("eij,ej->ei", T[oc][:, :3, :3], pts[op]) + T[oc][:, :3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) * [300, 300] + [160, 120]
    uv += rng.normal(0, 0.5, uv.shape)
    T_init = T.copy()
    for c in range(1, n_cams):
        T_init[c, :3, 3] += rng.normal(0, 0.03, 3)
    return ba.BAProblem(
        T_cw=jnp.asarray(T_init),
        K=jnp.broadcast_to(jnp.asarray(K), (n_cams, 3, 3)),
        cam_valid=jnp.ones(n_cams, bool),
        cam_fixed=jnp.zeros(n_cams, bool).at[0].set(True),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(oc),
        obs_point=jnp.asarray(op),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_sigma2=jnp.ones(n_edges, jnp.float32),
        obs_valid=jnp.ones(n_edges, bool),
    ), T


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return Mesh(np.array(jax.devices()[:8]), ("d",))


def test_distributed_ba_matches_single_device(mesh):
    prob, T_gt = build_problem()
    single = ba.bundle_adjust(prob, iters=8)
    sharded = dist_ba.shard_ba_problem(prob, mesh)
    step = dist_ba.make_distributed_ba(mesh, iters=8)
    dist = step(sharded)
    np.testing.assert_allclose(
        np.asarray(dist.T_cw), np.asarray(single.T_cw), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=5e-3
    )
    # edge outputs keep the edge sharding
    assert not dist.obs_inlier.is_fully_replicated


def test_distributed_ba_accuracy(mesh):
    prob, T_gt = build_problem(seed=3)
    sharded = dist_ba.shard_ba_problem(prob, mesh)
    step = dist_ba.make_distributed_ba(mesh, iters=10)
    res = step(sharded)
    est = np.asarray(res.T_cw)
    for c in range(6):
        assert np.linalg.norm(est[c, :3, 3] - T_gt[c, :3, 3]) < 0.02


def test_stream_parallel_extraction(mesh):
    from orbslamm_tpu.ops import orb as orb_ops
    from orbslamm_tpu.utils.config import CameraConfig, OrbConfig

    cam = CameraConfig(width=96, height=72, fx=80, fy=80, cx=48, cy=36)
    ext = orb_ops.make_extractor(OrbConfig(n_features=64, max_keypoints=128, n_levels=2), cam)
    streams = dist_ba.make_stream_extractor(mesh, ext)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 72, 96), np.uint8))
    feats = streams(imgs)
    assert feats.xy.shape == (8, 128, 2)
    # per-stream results equal the unsharded extraction
    f0 = ext(imgs[0])
    np.testing.assert_array_equal(np.asarray(feats.desc[0]), np.asarray(f0.desc))
