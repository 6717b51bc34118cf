"""Multi-chip parallelism: sharded bundle adjustment and robot-parallel maps.

The SPMD story (SURVEY.md §5.7-5.8, §7.1):

  * Observation EDGES are the data axis of bundle adjustment. Every reduction
    in ops/ba.py is a segment-sum over edges, so sharding the edge arrays
    across a device mesh makes XLA insert the psum-style collectives
    automatically under jit — the Schur reduced system (small, dense) is
    computed replicated on every chip from the all-reduced blocks. This is
    the distributed (MM)GlobalBundleAdjustemnt replacing the reference's
    single-threaded g2o run.
  * Robot streams are data-parallel: frame batches [S, H, W] shard their
    stream axis across devices; per-stream tracking math is identical
    (vmapped), so robot-parallelism is one sharding annotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslamm_tpu.ops import ba


def edge_sharding(mesh: Mesh, axis: str = "d"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_ba_problem(prob: ba.BAProblem, mesh: Mesh, axis: str = "d") -> ba.BAProblem:
    """Place edge arrays sharded over the mesh, state replicated."""
    es = edge_sharding(mesh, axis)
    rs = replicated(mesh)
    return ba.BAProblem(
        T_cw=jax.device_put(prob.T_cw, rs),
        K=jax.device_put(prob.K, rs),
        cam_valid=jax.device_put(prob.cam_valid, rs),
        cam_fixed=jax.device_put(prob.cam_fixed, rs),
        points=jax.device_put(prob.points, rs),
        point_valid=jax.device_put(prob.point_valid, rs),
        obs_cam=jax.device_put(prob.obs_cam, es),
        obs_point=jax.device_put(prob.obs_point, es),
        obs_uv=jax.device_put(prob.obs_uv, es),
        obs_sigma2=jax.device_put(prob.obs_sigma2, es),
        obs_valid=jax.device_put(prob.obs_valid, es),
    )


def make_distributed_ba(mesh: Mesh, iters: int = 10, axis: str = "d"):
    """Jitted distributed BA step: edge arrays sharded, state replicated.

    GSPMD partitions the per-edge residual/Jacobian work across chips and
    all-reduces the assembled Hcc/Hpp/g/W blocks over ICI; the dense reduced
    solve runs replicated. Returns a function BAProblem -> BAResult.
    """
    es = edge_sharding(mesh, axis)
    rs = replicated(mesh)
    in_shardings = ba.BAProblem(
        T_cw=rs, K=rs, cam_valid=rs, cam_fixed=rs, points=rs, point_valid=rs,
        obs_cam=es, obs_point=es, obs_uv=es, obs_sigma2=es, obs_valid=es,
    )
    out_shardings = ba.BAResult(T_cw=rs, points=rs, obs_inlier=es, cost=rs)
    return jax.jit(
        lambda p: ba.bundle_adjust(p, iters=iters),
        in_shardings=(in_shardings,),
        out_shardings=out_shardings,
    )


def make_stream_extractor(mesh: Mesh, extract_fn, axis: str = "d"):
    """Robot-parallel feature extraction: images [S, H, W] sharded on S."""
    ss = NamedSharding(mesh, P(axis, None, None))
    vf = jax.vmap(extract_fn)
    return jax.jit(vf, in_shardings=(ss,))
