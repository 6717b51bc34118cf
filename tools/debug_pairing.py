"""Debug the owner/follower pairing path of test_bank_cross_robot_merge."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from pathlib import Path
import numpy as np

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.models.system import TrackingState
from orbslamm_tpu.parallel import streams as ps
from orbslamm_tpu.utils.config import LoopConfig
from orbslamm_tpu.utils.trace import get_tracer
from tests.test_streams import CFG, CAM

CHUNK = 8
n_total = 200
seq = make_sequence(n_frames=n_total, n_points=2500, cam=CAM, seed=21,
                    motion="strafe")
half = 152
starts = [0, n_total - half]
vocab = Path("/root/repo/orbslamm_tpu/data/vocab_10x4.npz")
cfg = CFG.replace(
    vocabulary_path=str(vocab) if vocab.exists() else None,
    loop=dataclasses.replace(
        LoopConfig(), min_sim3_inliers=10, min_bow_matches=10,
        min_kfs_for_merge=6,
    ),
)
mm = MultiMapper(cfg)
robots = [mm.add_robot(f"r{k}") for k in range(2)]
offs = []
for k, t in enumerate(robots):
    i = 0
    while t.state != TrackingState.OK and i < half:
        mm.process_frame(k, seq.images[starts[k] + i],
                         float(seq.timestamps[starts[k] + i]))
        i += 1
    assert t.state == TrackingState.OK, f"robot {k} failed init"
    offs.append(i)
start = max(offs)
for k, t in enumerate(robots):
    for j in range(offs[k], start):
        mm.process_frame(k, seq.images[starts[k] + j],
                         float(seq.timestamps[starts[k] + j]))
print("start", start, "map ids", [t.mapctx.map_id for t in robots])

bank = ps.StreamBank(cfg, robots, chunk_size=CHUNK)
bank.on_lost = lambda t: mm._handle_loss(t, 0.0)
bank.on_chunk_end = mm.pump_merge_scans
i = start
while i + CHUNK <= half:
    imgs = np.stack([
        np.stack(seq.images[starts[k] + i : starts[k] + i + CHUNK])
        for k in range(2)
    ])
    stamps = np.stack([
        seq.timestamps[starts[k] + i : starts[k] + i + CHUNK]
        for k in range(2)
    ])
    bank.process_chunk(imgs, stamps)
    print("chunk@", i, "states", [t.state.name for t in robots],
          "maps", [t.mapctx.map_id for t in robots],
          "n_kf", [t.mapctx.n_kf for t in robots],
          "followers", bank.followers, "merges", mm.merges)
    i += CHUNK
bank.sync_to_trackers()
mm.flush_merge_scans()
print("final merges", mm.merges, "followers", bank.followers)
for f in robots[1].frames:
    print("r1", f.frame_id, f.state, "inl", f.n_inliers, "map", f.map_id)
tr = get_tracer()
for name in ("new_map_on_loss", "early_loss_reset", "map_merge",
             "bank_follower", "bank_owner_promoted",
             "bank_backlog_dropped", "merge_landmarks_evicted",
             "loop_closed", "gba_converged"):
    for e in tr.events(name):
        print(name, e)
