"""Debug: why does the StreamBank lose robot0 (seed 7) while the
single-stream chunk path keeps it OK? Prints per-frame inliers both ways."""
import numpy as np
import jax
from jax.sharding import Mesh

import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
jax.config.update("jax_platforms", "cpu")

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import MonocularSession, TrackingState
from orbslamm_tpu.parallel import streams as ps
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

CAM = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120, fps=30)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
    capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
    tracking=TrackingConfig(
        pixel_noise=1.2, min_matches_init=60, init_min_triangulated=45,
        init_min_parallax_deg=0.7,
    ),
)
N_FRAMES = 44
CHUNK = 8


def _bootstrap(seed):
    seq = make_sequence(n_frames=N_FRAMES, n_points=2500, cam=CAM, seed=seed,
                        motion="strafe")
    sess = MonocularSession(CFG)
    sess.enable_loop_closing = False
    i = 0
    while sess.state != TrackingState.OK and i < N_FRAMES:
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
        i += 1
    assert sess.state == TrackingState.OK
    return sess, seq, i


boots = [_bootstrap(seed) for seed in (7, 9, 13, 33)]
start = max(b[2] for b in boots)
for sess, seq, i in boots:
    for j in range(i, start):
        sess.process_frame(seq.images[j], float(seq.timestamps[j]))

mesh = Mesh(np.array(jax.devices()[:4]), ("r",))
bank = ps.StreamBank(CFG, [b[0].tracker for b in boots], mesh=mesh,
                     chunk_size=CHUNK)
i = start
while i + CHUNK <= N_FRAMES:
    imgs = np.stack([np.stack(b[1].images[i : i + CHUNK]) for b in boots])
    stamps = np.stack([b[1].timestamps[i : i + CHUNK] for b in boots])
    bank.process_chunk(imgs, stamps)
    i += CHUNK
bank.sync_to_trackers()

from orbslamm_tpu.eval.ate import ate_from_poses
for r, (sess, seq, _) in enumerate(boots):
    ts, est = sess.frame_trajectory()
    idx = [int(round(t * CAM.fps)) for t in ts]
    ate = ate_from_poses(est, seq.poses_cw[idx]) if len(est) else -1
    frozen = np.stack([f.T_cw for f in sess.frames if f.state == 'OK'])
    atef = ate_from_poses(frozen, seq.poses_cw[idx]) if len(est) else -1
    m = sess.tracker.mapctx.map
    kv = np.asarray(m.kf_valid)
    kfp = np.asarray(m.kf_pose)[kv]
    fids = np.asarray(m.kf_frame_id)[kv]
    kate = ate_from_poses(kfp, seq.poses_cw[fids]) if kv.sum() >= 3 else -1
    print(f"robot{r} state={sess.tracker.state.name} n_kf={sess.tracker.mapctx.n_kf} ate={ate:.3f} ate_frozen={atef:.3f} kf_ate={kate:.3f} n={len(est)}")
    for f in sess.tracker.frames:
        print(f"  r{r} f{f.frame_id} {f.state} inl={f.n_inliers}")

# single-stream comparison for robot 0
sess0, seq0, i0 = _bootstrap(7)
for j in range(i0, start):
    sess0.process_frame(seq0.images[j], float(seq0.timestamps[j]))
j = start
while j + CHUNK <= N_FRAMES:
    sess0.tracker.process_frames(
        np.stack(seq0.images[j : j + CHUNK]), seq0.timestamps[j : j + CHUNK]
    )
    j += CHUNK
print(f"single state={sess0.tracker.state.name} n_kf={sess0.tracker.mapctx.n_kf}")
for f in sess0.tracker.frames:
    print(f"  s  f{f.frame_id} {f.state} inl={f.n_inliers}")
