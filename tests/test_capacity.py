"""Reference-scale capacity: the pools must work at KITTI-00 magnitudes
(K>=1024 keyframes, L>=65536 landmarks — reference KITTI00-02.yaml runs
4541 frames / thousands of KFs with 2000 features).

The dense-indicator design is quadratic-ish in capacity; lm_indicator
switches to a scatter build above ~2^31 compare-ops (see PROFILE.md for
v5e timings: 52 ms indicator build + 30 ms covisibility matmul at
K=1024/L=65536). This test drives the REAL keyframe-insert pipeline
(triangulate → fuse → windowed BA → culls) at that capacity on CPU and
checks per-insert time stays bounded (no hidden growth with slot index)
and the derived structures remain correct.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.io.synthetic import make_landmark_field
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models.system import MapContext
from orbslamm_tpu.ops.orb import Features
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig,
)

CAM = CameraConfig(width=640, height=480, fx=520.0, fy=520.0, cx=320, cy=240)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=500, max_keypoints=512, n_levels=4),
    capacity=CapacityConfig(max_keyframes=1024, max_landmarks=65536),
)


def _synth_kf(rng, pts_w, T_cw, Mfeat, lm_slot, frac_known=0.6):
    """Features for a keyframe at T_cw observing a random subset of pts_w."""
    pc = (T_cw[:3, :3] @ pts_w.T).T + T_cw[:3, 3]
    vis = pc[:, 2] > 0.2
    uv = np.stack([
        520.0 * pc[:, 0] / np.maximum(pc[:, 2], 1e-6) + 320,
        520.0 * pc[:, 1] / np.maximum(pc[:, 2], 1e-6) + 240,
    ], -1)
    vis &= (uv[:, 0] >= 8) & (uv[:, 0] < 632) & (uv[:, 1] >= 8) & (uv[:, 1] < 472)
    cand = np.nonzero(vis)[0]
    rng.shuffle(cand)
    cand = cand[:Mfeat]
    n = len(cand)
    xy = np.zeros((Mfeat, 2), np.float32)
    xy[:n] = uv[cand] + rng.normal(0, 0.4, (n, 2))
    desc = np.zeros((Mfeat, 32), np.uint8)
    desc[:n] = (pts_w[cand, :1] * 255).astype(np.uint8) + np.arange(n)[:, None] % 7
    valid = np.zeros(Mfeat, bool)
    valid[:n] = True
    obs = np.full(Mfeat, -1, np.int32)
    known = rng.random(n) < frac_known
    obs[:n][known] = lm_slot[cand[known]]
    return Features(
        xy=jnp.asarray(xy), xy_raw=jnp.asarray(xy),
        angle=jnp.zeros(Mfeat, jnp.float32),
        response=jnp.where(jnp.asarray(valid), 50.0, 0.0),
        level=jnp.zeros(Mfeat, jnp.int32),
        desc=jnp.asarray(desc), valid=jnp.asarray(valid),
    ), obs


@pytest.mark.slow
def test_capacity_insert_pipeline_bounded():
    rng = np.random.default_rng(3)
    pts = make_landmark_field(20000, seed=3)
    mc = MapContext(CFG)
    Mfeat = CFG.orb.max_keypoints
    L = CFG.capacity.max_landmarks

    # seed landmarks (a long-lived map already rich in structure)
    n_seed = 12000
    slots = jnp.arange(n_seed, dtype=jnp.int32)
    sel = rng.choice(len(pts), n_seed, replace=False)
    lm_slot = np.full(len(pts), -1, np.int64)
    lm_slot[sel] = np.arange(n_seed)
    d = pts[sel]
    mc.map = ms.add_landmarks(
        mc.map, slots, jnp.ones(n_seed, bool), jnp.asarray(d, jnp.float32),
        jnp.zeros((n_seed, 32), jnp.uint8),
        jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32),
        jnp.full((n_seed,), 0.1, jnp.float32), jnp.full((n_seed,), 50.0, jnp.float32),
        0,
    )

    # walk a trajectory inserting keyframes through the FULL pipeline
    n_kf = 40
    times = []
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.08 * k  # slow strafe
        feats, obs = _synth_kf(rng, pts, T, Mfeat, lm_slot)
        t0 = time.perf_counter()
        mc.insert_keyframe(jnp.asarray(T), jnp.asarray(CAM.K()), feats,
                           jnp.asarray(obs), k, float(k) / 30.0)
        jnp.asarray(mc.map.kf_pose).block_until_ready()
        times.append(time.perf_counter() - t0)

    # derived structures correct at capacity (scatter indicator path)
    assert CFG.capacity.max_keyframes * Mfeat * L >= 2**31  # scatter path on
    ind = ms.lm_indicator(mc.map)
    assert ind.shape == (1024, 65536)
    row0 = np.asarray(ind[0])
    obs0 = np.asarray(mc.map.kf_obs_lm[0])
    fv0 = np.asarray(mc.map.kf_feat_valid[0])
    expect = np.zeros(L)
    expect[obs0[fv0 & (obs0 >= 0)]] = 1.0
    assert (row0 == expect).all(), "scatter indicator row mismatch"
    W = np.asarray(ms.covisibility(mc.map))
    assert W[0, 1] > 0 and (np.diag(W) == 0).all()

    # per-insert time must not grow with slot index (bounded pipeline):
    # compare medians of the 2nd and 4th quartiles, excluding compile frames
    steady = times[8:]
    early = np.median(steady[: len(steady) // 2])
    late = np.median(steady[len(steady) // 2 :])
    assert late < 2.5 * early, f"insert time grows: {early:.2f}s -> {late:.2f}s"

    # memory bounded: pools well under 2 GB total
    total = sum(np.asarray(x).nbytes for x in mc.map)
    assert total < 2 << 30, f"map pools {total/2**30:.2f} GiB"
