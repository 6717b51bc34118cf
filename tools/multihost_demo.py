"""Two-process cross-host merge demonstration (SURVEY §5.8 / VERDICT r4 #4).

Each process runs ONE robot over its half of a shared synthetic scene (the
mono_kitti_dif-Seq split-sequence pattern across PROCESSES instead of
threads), with its own MultiMapper. A HostMapperBridge exchanges map
signatures over the jax.distributed collective fabric; the process whose
database recognizes the other's map pulls its payload and merges it through
the standard Sim3-verified pipeline.

Run (two shells, or see tests/test_multihost_merge.py which spawns both):

  python tools/multihost_demo.py --process-id 0 --num-processes 2 \
      --coordinator localhost:19876 --out /tmp/mh0.json
  python tools/multihost_demo.py --process-id 1 --num-processes 2 \
      --coordinator localhost:19876 --out /tmp/mh1.json
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:19876")
    ap.add_argument("--out", default="")
    ap.add_argument("--frames", type=int, default=168)
    args = ap.parse_args()

    from orbslamm_tpu.parallel import multihost as mh

    mh.initialize(coordinator_address=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    pid = jax.process_index()

    import dataclasses
    from pathlib import Path

    import numpy as np

    from orbslamm_tpu.eval.ate import ate_from_poses
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.models.multimap import MultiMapper
    from orbslamm_tpu.models.system import TrackingState
    from orbslamm_tpu.parallel.multihost_mapper import HostMapperBridge
    from orbslamm_tpu.utils.config import (
        CameraConfig, CapacityConfig, LoopConfig, OrbConfig, SlamConfig,
        TrackingConfig,
    )

    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                       cy=120, fps=30)
    vocab = Path(__file__).resolve().parents[1] / "orbslamm_tpu" / "data" / "vocab_10x4.npz"
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=60, init_min_triangulated=45,
            init_min_parallax_deg=0.4,
        ),
        loop=dataclasses.replace(
            LoopConfig(), min_sim3_inliers=10, min_bow_matches=10,
            min_kfs_for_merge=6,
        ),
        vocabulary_path=str(vocab) if vocab.exists() else None,
    )
    # vocabulary consistency across hosts (same file on every host here;
    # broadcast_pytree would ship it if only host 0 had the file)

    n_total = args.frames
    half = int(n_total * 0.64)
    starts = [0, n_total - half]
    seq = make_sequence(n_frames=n_total, n_points=1800, cam=cam, seed=21,
                        motion="strafe")
    mm = MultiMapper(cfg)
    robot = mm.add_robot(f"host{pid}")
    bridge = HostMapperBridge(mm)

    s0 = starts[pid]
    for i in range(half):
        mm.process_frame(0, seq.images[s0 + i], float(seq.timestamps[s0 + i]))
    mm.flush_merge_scans()
    ok = [f for f in robot.frames if f.state == "OK"]
    print(f"[host{pid}] tracked {len(ok)}/{half} frames, "
          f"maps={len(mm.live_maps())}", flush=True)

    # lockstep exchange rounds: signatures → payload migration → local
    # Sim3-verified merge of the imported map
    merged = False
    for _ in range(6):
        bridge.exchange()
        for _ in range(4):
            merged = mm.pump_merge_scans() or merged
        merged = mm.flush_merge_scans() or merged
    mh.barrier()

    result = {
        "process": pid,
        "tracked": len(ok),
        "merges": mm.merges,
        "imported": len(bridge._imported),
        "transfers": bridge.transfers,
        "state": robot.state.name,
    }
    if mm.merges:
        from orbslamm_tpu.models.system import resolve_frame_poses

        base = next(m for m in mm.maps if m.map_id == mm.merges[0][1])
        result["merged_n_kf"] = int(np.asarray(base.map.kf_valid).sum())
        # this host's frames resolved against the merged map (timestamps
        # are global scene time, so ground truth indexes directly)
        ok2 = [f for f in robot.frames
               if f.state == "OK" and f.map_id == base.map_id]
        if len(ok2) >= 10:
            est = np.stack(resolve_frame_poses(ok2))
            idx = [min(int(round(f.timestamp * cam.fps)), n_total - 1)
                   for f in ok2]
            ate = float(ate_from_poses(est, seq.poses_cw[idx]))
            result["merged_frames_ate"] = round(ate, 4)
    print(f"[host{pid}] result: {json.dumps(result)}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
