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


# ---------------------------------------------------------------------------
# Keyframe-block-sharded global BA (BASELINE §5.7: "maps / keyframe blocks
# sharded across hosts")
# ---------------------------------------------------------------------------

def map_kf_shardings(mesh: Mesh, axis: str = "d"):
    """MapState sharding spec: keyframe-axis arrays sharded in BLOCKS over
    the mesh, landmark pool + counters replicated.

    This is the long-context analog the reference lacks (SURVEY.md §5.7):
    one large/merged map's keyframes — poses, feature blocks, observation
    rows — live block-distributed across devices; landmark state is the
    replicated "parameter server" side that every block's Schur reduction
    psums into.
    """
    from orbslamm_tpu.models import map_state as ms

    ks = NamedSharding(mesh, P(axis))
    rs = NamedSharding(mesh, P())
    return ms.MapState(
        kf_pose=ks, kf_K=ks, kf_valid=ks, kf_fixed=ks, kf_frame_id=ks,
        kf_timestamp=ks, kf_xy=ks, kf_desc=ks, kf_level=ks, kf_angle=ks,
        kf_feat_valid=ks, kf_obs_lm=ks, kf_ur=ks,
        lm_pos=rs, lm_valid=rs, lm_desc=rs, lm_normal=rs, lm_dist_min=rs,
        lm_dist_max=rs, lm_ref_kf=rs, lm_first_kf=rs, lm_visible=rs,
        lm_found=rs, loop_edges=rs, n_kf=rs, n_lm=rs,
    )


def shard_map_kf_blocks(m, mesh: Mesh, axis: str = "d"):
    """Place a MapState with keyframe blocks sharded across the mesh."""
    spec = map_kf_shardings(mesh, axis)
    return jax.tree.map(jax.device_put, m, spec)


def make_kf_sharded_gba(mesh: Mesh, cfg, iters: int = 8, axis: str = "d",
                        cg_iters: int = 30):
    """Jitted global BA over a keyframe-block-sharded MapState.

    Uses the MATRIX-FREE CG solver (ops/ba.bundle_adjust_cg) on the map's
    kf-major edge list: the [K*M] edge arrays are reshapes of kf-sharded
    [K, M] arrays, so every per-edge residual/Jacobian and every camera
    reduction stays LOCAL to a keyframe shard, and only the small per-point
    blocks ([P,3,3] Hpp, [P,3] CG vectors) cross shards as psums — no
    [W,P] incidence tensor, no dense [W,V] Schur coupling (the previous
    formulation all-gathered a [W,P,6,3] tensor per LM iteration, which is
    why it scaled NEGATIVELY). Replaces the reference's single-threaded
    g2o GlobalBundleAdjustemnt (Optimizer.cc:40/59) with a
    collective-parallel solve whose work scales with keyframes-per-device.
    Returns MapState -> MapState (poses + landmark positions updated).
    """
    import jax.numpy as jnp

    from orbslamm_tpu.ops import ba as ba_ops

    spec = map_kf_shardings(mesh, axis)

    def gba(m):
        K, Mfeat = m.kf_obs_lm.shape
        obs_lm = m.kf_obs_lm
        feat_ok = m.kf_feat_valid & (obs_lm >= 0) & m.kf_valid[:, None]
        lm_idx = jnp.maximum(obs_lm, 0)
        feat_ok &= m.lm_valid[lm_idx]
        obs_cam = jnp.broadcast_to(jnp.arange(K)[:, None], (K, Mfeat))
        sigma2 = (
            cfg.tracking.pixel_noise
            * cfg.orb.scale_factor ** m.kf_level.astype(jnp.float32)
        ) ** 2
        prob = ba_ops.BAProblem(
            T_cw=m.kf_pose,
            K=m.kf_K,
            cam_valid=m.kf_valid,
            cam_fixed=m.kf_fixed,
            points=m.lm_pos,
            point_valid=m.lm_valid,
            obs_cam=obs_cam.reshape(-1).astype(jnp.int32),
            obs_point=lm_idx.reshape(-1).astype(jnp.int32),
            obs_uv=m.kf_xy.reshape(-1, 2),
            obs_sigma2=sigma2.reshape(-1),
            obs_valid=feat_ok.reshape(-1),
            obs_ur=m.kf_ur.reshape(-1) if cfg.camera.bf > 0 else None,
            bf=(
                jnp.full((K,), cfg.camera.bf, jnp.float32)
                if cfg.camera.bf > 0
                else None
            ),
        )
        res = ba_ops.bundle_adjust_cg(prob, iters=iters, cg_iters=cg_iters)
        return m._replace(
            kf_pose=jnp.where(m.kf_valid[:, None, None], res.T_cw, m.kf_pose),
            lm_pos=res.points,
        )

    return jax.jit(gba, in_shardings=(spec,), out_shardings=spec)
