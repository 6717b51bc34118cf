"""Map state as fixed-capacity structure-of-arrays pools.

Replaces the reference's pointer object graph (Map/KeyFrame/MapPoint,
SURVEY.md §L1) with masked array pools sized by CapacityConfig — the
fixed-shape contract every jitted stage relies on:

  * keyframe pool   — poses, per-KF feature blocks, feature→landmark links
  * landmark pool   — positions, representative descriptors, view stats
  * covisibility    — NOT stored: derived on demand as an indicator matmul
    (shared-landmark counts), replacing KeyFrame::UpdateConnections
    (KeyFrame.cc:314) entirely. Spanning tree = argmax covisibility among
    older keyframes, replacing the parent/children bookkeeping.

Culling = clearing valid bits (MapPoint::SetBadFlag analog); slot reuse =
allocating invalid slots. No compaction is ever needed on-device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.ops.orb import Features
from orbslamm_tpu.utils.config import SlamConfig


class MapState(NamedTuple):
    # --- keyframes [K, ...] ---
    kf_pose: jax.Array  # [K,4,4] Tcw
    kf_K: jax.Array  # [K,3,3] intrinsics (per-KF: multi-robot calibrations)
    kf_valid: jax.Array  # [K] bool
    kf_fixed: jax.Array  # [K] bool — BA gauge anchor (origin KF)
    kf_frame_id: jax.Array  # [K] int32 source frame index
    kf_timestamp: jax.Array  # [K] float64-as-float32 pair avoided; float32 s
    # per-KF feature block [K, M, ...]
    kf_xy: jax.Array  # [K,M,2] undistorted pixel coords
    kf_desc: jax.Array  # [K,M,32] uint8
    kf_level: jax.Array  # [K,M] int32
    kf_angle: jax.Array  # [K,M] float32
    kf_feat_valid: jax.Array  # [K,M] bool
    kf_obs_lm: jax.Array  # [K,M] int32 — landmark id per feature, -1 if none
    kf_ur: jax.Array  # [K,M] float32 — stereo right-x per feature, -1 = mono
    # (reference KeyFrame::mvuRight; feeds the stereo BA residual)
    # --- landmarks [L, ...] ---
    lm_pos: jax.Array  # [L,3] world position
    lm_valid: jax.Array  # [L] bool
    lm_desc: jax.Array  # [L,32] uint8 representative descriptor
    lm_normal: jax.Array  # [L,3] mean viewing direction
    lm_dist_min: jax.Array  # [L] scale-invariance band (PredictScale analog)
    lm_dist_max: jax.Array  # [L]
    lm_ref_kf: jax.Array  # [L] int32 reference keyframe
    lm_first_kf: jax.Array  # [L] int32 keyframe that created it (culling age)
    lm_visible: jax.Array  # [L] int32 — times predicted visible (found ratio)
    lm_found: jax.Array  # [L] int32 — times actually matched
    # --- loop edges [E,2] int32, -1 = empty slot ---
    # persistent record of closed loops (KeyFrame::AddLoopEdge,
    # LoopClosing.cc:577-579): EVERY past loop edge re-enters every
    # essential-graph optimization (Optimizer.cc:1126-1139) so later
    # corrections cannot re-break earlier seams
    loop_edges: jax.Array
    # --- counters (device scalars) ---
    n_kf: jax.Array  # int32 — high-water mark of allocated KF slots
    n_lm: jax.Array  # int32


def empty_map(cfg: SlamConfig) -> MapState:
    K = cfg.capacity.max_keyframes
    M = cfg.orb.max_keypoints
    L = cfg.capacity.max_landmarks
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_K=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_fixed=jnp.zeros(K, bool),
        kf_frame_id=jnp.zeros(K, i32),
        kf_timestamp=jnp.zeros(K, f32),
        kf_xy=jnp.zeros((K, M, 2), f32),
        kf_desc=jnp.zeros((K, M, 32), jnp.uint8),
        kf_level=jnp.zeros((K, M), i32),
        kf_angle=jnp.zeros((K, M), f32),
        kf_feat_valid=jnp.zeros((K, M), bool),
        kf_ur=jnp.full((K, M), -1.0, f32),
        kf_obs_lm=jnp.full((K, M), -1, i32),
        lm_pos=jnp.zeros((L, 3), f32),
        lm_valid=jnp.zeros(L, bool),
        lm_desc=jnp.zeros((L, 32), jnp.uint8),
        lm_normal=jnp.zeros((L, 3), f32),
        lm_dist_min=jnp.zeros(L, f32),
        lm_dist_max=jnp.full(L, 1e9, f32),
        lm_ref_kf=jnp.zeros(L, i32),
        lm_first_kf=jnp.zeros(L, i32),
        lm_visible=jnp.zeros(L, i32),
        lm_found=jnp.zeros(L, i32),
        loop_edges=jnp.full((cfg.capacity.max_loop_edges, 2), -1, i32),
        n_kf=jnp.zeros((), i32),
        n_lm=jnp.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# Derived structure
# ---------------------------------------------------------------------------

def lm_indicator(m: MapState) -> jax.Array:
    """[K, L] float32 — 1 where keyframe k observes landmark l.

    Two formulations, chosen by problem size (static shapes, host branch):
      * compare+reduce (fused by XLA into a streaming reduction, no
        [K,M,L] materialization) — O(K*M*L) byte-ops, fastest at
        small/medium capacities where TPU scatters would serialize;
      * row+column scatter-max — O(K*M) updates, the only feasible path at
        reference scale (K=1024, L=65536: compare would be 1.4e14 ops; the
        scatter measures ~52 ms on a v5e, see PROFILE.md).
    Feeds the covisibility matmul and observation counting.
    """
    K, M = m.kf_obs_lm.shape
    L = m.lm_pos.shape[0]
    if K * M * L >= 2**31:
        o = jnp.where(m.kf_feat_valid & (m.kf_obs_lm >= 0), m.kf_obs_lm, L)
        rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, M))
        ind = jnp.zeros((K, L + 1), jnp.float32).at[rows, o].max(1.0)[:, :L]
        return ind * m.kf_valid[:, None]
    obs = jnp.where(m.kf_feat_valid & (m.kf_obs_lm >= 0), m.kf_obs_lm, -1)
    hit = obs[:, :, None] == jnp.arange(L, dtype=obs.dtype)[None, None, :]
    ind = jnp.max(hit, axis=1).astype(jnp.float32)
    return ind * m.kf_valid[:, None]


def indicator_row(m: MapState, slot: jax.Array) -> jax.Array:
    """ONE keyframe's [L] observation-indicator row WITHOUT a scatter.

    TPU scatters serialize per update (~50 ms for 2048 updates on a v5e);
    the one-hot contraction below is a [M,L]-shaped compare+reduce the VPU
    eats in a fraction of a millisecond."""
    L = m.lm_pos.shape[0]
    obs = jnp.where(m.kf_feat_valid[slot] & (m.kf_obs_lm[slot] >= 0),
                    m.kf_obs_lm[slot], -1)
    hit = obs[:, None] == jnp.arange(L, dtype=obs.dtype)[None, :]  # [M,L]
    row = jnp.max(hit, axis=0).astype(jnp.float32)
    return row * m.kf_valid[slot]


def refresh_indicator_row(m: MapState, ind: jax.Array, slot: jax.Array) -> jax.Array:
    """Recompute ONE keyframe's row of the [K,L] observation indicator
    (after insert_keyframe set its kf_obs_lm row)."""
    return ind.at[slot].set(indicator_row(m, slot))


def covisibility(m: MapState, ind: jax.Array | None = None) -> jax.Array:
    """[K, K] int32 — shared-landmark counts (KeyFrame::GetCovisibles...).

    The indicator matmul runs on the MXU; diag is zeroed.
    """
    ind = lm_indicator(m) if ind is None else ind
    W = ind @ ind.T
    W = W * (1.0 - jnp.eye(W.shape[0]))
    return W.astype(jnp.int32)


def lm_obs_count(m: MapState, ind: jax.Array | None = None) -> jax.Array:
    """[L] int32 — number of keyframes observing each landmark."""
    ind = lm_indicator(m) if ind is None else ind
    return jnp.sum(ind, axis=0).astype(jnp.int32)


def spanning_parent(m: MapState) -> jax.Array:
    """[K] int32 parent = most covisible OLDER keyframe (the spanning tree
    used for trajectory reconstruction and correction propagation)."""
    W = covisibility(m)
    K = W.shape[0]
    older = jnp.arange(K)[None, :] < jnp.arange(K)[:, None]
    Wm = jnp.where(older & m.kf_valid[None, :], W, -1)
    parent = jnp.argmax(Wm, axis=1).astype(jnp.int32)
    has = jnp.max(Wm, axis=1) > 0
    return jnp.where(has & m.kf_valid, parent, -1)


# ---------------------------------------------------------------------------
# Mutations (all pure: return a new MapState)
# ---------------------------------------------------------------------------

def insert_keyframe(
    m: MapState,
    slot: jax.Array,
    T_cw: jax.Array,
    K_mat: jax.Array,
    feats: Features,
    obs_lm: jax.Array,
    frame_id,
    timestamp,
    fixed=False,
) -> MapState:
    """Write one keyframe into ``slot`` (int32 scalar)."""
    return m._replace(
        kf_pose=m.kf_pose.at[slot].set(T_cw),
        kf_K=m.kf_K.at[slot].set(K_mat),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_fixed=m.kf_fixed.at[slot].set(fixed),
        kf_frame_id=m.kf_frame_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        kf_timestamp=m.kf_timestamp.at[slot].set(jnp.asarray(timestamp, jnp.float32)),
        kf_xy=m.kf_xy.at[slot].set(feats.xy),
        kf_desc=m.kf_desc.at[slot].set(feats.desc),
        kf_level=m.kf_level.at[slot].set(feats.level),
        kf_angle=m.kf_angle.at[slot].set(feats.angle),
        kf_feat_valid=m.kf_feat_valid.at[slot].set(feats.valid),
        kf_obs_lm=m.kf_obs_lm.at[slot].set(jnp.where(feats.valid, obs_lm, -1)),
        kf_ur=m.kf_ur.at[slot].set(
            jnp.full(feats.valid.shape, -1.0, jnp.float32)
            if feats.u_right is None
            else jnp.where(feats.valid, feats.u_right, -1.0)
        ),
        n_kf=jnp.maximum(m.n_kf, slot.astype(jnp.int32) + 1),
    )


def free_lm_slots(m: MapState, n: int, by_value: bool = False) -> jax.Array:
    """[n] int32 indices of free landmark slots (top-n least-valid).

    With ``by_value``, occupied slots are ranked by landmark VALUE (found
    ratio, MapPoint::GetFoundRatio): if the pool overflows and occupied
    slots must be handed out (merge transplant into a tight pool), the
    worst-performing landmarks are sacrificed first instead of arbitrary
    ones."""
    L = m.lm_valid.shape[0]
    if by_value:
        ratio = m.lm_found.astype(jnp.float32) / jnp.maximum(
            m.lm_visible.astype(jnp.float32), 1.0
        )
        occupied_key = -1e6 - 1e3 * ratio
    else:
        occupied_key = jnp.full((L,), -1e9)
    key = jnp.where(m.lm_valid, occupied_key,
                    -jnp.arange(L, dtype=jnp.float32))
    _, idx = jax.lax.top_k(key, n)
    return idx.astype(jnp.int32)


def add_landmarks(
    m: MapState,
    slots: jax.Array,  # [n] int32
    use: jax.Array,  # [n] bool — which slots actually get written
    pos: jax.Array,  # [n,3]
    desc: jax.Array,  # [n,32] uint8
    normal: jax.Array,  # [n,3]
    dist_min: jax.Array,
    dist_max: jax.Array,
    ref_kf,
) -> MapState:
    # out-of-bounds indices are DROPPED — masked entries write nowhere
    idx = jnp.where(use, slots, m.lm_pos.shape[0])
    ref = jnp.broadcast_to(jnp.asarray(ref_kf, jnp.int32), slots.shape)
    ones = jnp.ones_like(slots)
    return m._replace(
        lm_pos=m.lm_pos.at[idx].set(pos, mode="drop"),
        lm_valid=m.lm_valid.at[idx].set(True, mode="drop"),
        lm_desc=m.lm_desc.at[idx].set(desc, mode="drop"),
        lm_normal=m.lm_normal.at[idx].set(normal, mode="drop"),
        lm_dist_min=m.lm_dist_min.at[idx].set(dist_min, mode="drop"),
        lm_dist_max=m.lm_dist_max.at[idx].set(dist_max, mode="drop"),
        lm_ref_kf=m.lm_ref_kf.at[idx].set(ref, mode="drop"),
        lm_first_kf=m.lm_first_kf.at[idx].set(ref, mode="drop"),
        lm_visible=m.lm_visible.at[idx].set(ones, mode="drop"),
        lm_found=m.lm_found.at[idx].set(ones, mode="drop"),
        n_lm=jnp.maximum(m.n_lm, jnp.max(jnp.where(use, slots + 1, 0)).astype(jnp.int32)),
    )


def keyframe_centers(m: MapState) -> jax.Array:
    """[K,3] camera centers (world frame)."""
    R = m.kf_pose[:, :3, :3]
    t = m.kf_pose[:, :3, 3]
    return -jnp.einsum("kji,kj->ki", R, t)


def as_numpy_summary(m: MapState) -> dict:
    """Host-side readout for logging / HUD (FrameDrawer status analog)."""
    return {
        "n_kf": int(np.asarray(m.kf_valid.sum())),
        "n_lm": int(np.asarray(m.lm_valid.sum())),
    }
