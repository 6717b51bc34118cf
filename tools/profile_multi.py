"""Dev-only profiling of bench.py's two-robot phase: per-chunk and
per-subsystem (tracer span) timings, to find where the post-merge
steady-state chunk time goes."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import bench
from orbslamm_tpu.utils.trace import get_tracer


def main():
    cfg = bench._cfg()
    import dataclasses

    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.models.multimap import MultiMapper
    from orbslamm_tpu.models.system import TrackingState
    from orbslamm_tpu.parallel import streams as ps

    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, min_matches_init=60, init_min_triangulated=35,
    ))
    CHUNK = bench.CHUNK
    n_total = 168
    half = 104
    starts = [0, n_total - half]
    seq = make_sequence(n_frames=n_total, n_points=2500, cam=cfg.camera,
                        seed=21, motion="strafe")
    mm = MultiMapper(cfg)
    robots = [mm.add_robot(f"r{k}") for k in range(2)]

    offs = []
    for k, t in enumerate(robots):
        i, streak = 0, 0
        while streak < 3 and i < half // 2:
            r = mm.process_frame(k, seq.images[starts[k] + i],
                                 float(seq.timestamps[starts[k] + i]))
            streak = streak + 1 if r.state == "OK" else 0
            i += 1
        assert t.state == TrackingState.OK, f"robot {k} init failed"
        offs.append(i)
    start = max(offs)
    for k, t in enumerate(robots):
        for j in range(offs[k], start):
            mm.process_frame(k, seq.images[starts[k] + j],
                             float(seq.timestamps[starts[k] + j]))

    bank = ps.StreamBank(cfg, robots, chunk_size=CHUNK)
    bank.on_lost = lambda t: mm._handle_loss(t, 0.0)
    bank.on_chunk_end = mm.pump_merge_scans

    def chunk_at(i):
        imgs = np.stack([
            np.stack(seq.images[starts[k] + i : starts[k] + i + CHUNK])
            for k in range(2)
        ])
        stamps = np.stack([
            seq.timestamps[starts[k] + i : starts[k] + i + CHUNK]
            for k in range(2)
        ])
        return imgs, stamps

    tr = get_tracer()
    i = start
    per_chunk = []
    snap_prev = {}

    def span_totals():
        return {k: v["total_s"] for k, v in tr.stage_summary().items()}

    while i + CHUNK <= half:
        imgs, stamps = chunk_at(i)
        t0 = time.perf_counter()
        bank.process_chunk(imgs, stamps)
        dt = time.perf_counter() - t0
        snap = span_totals()
        delta = {k: round(snap.get(k, 0) - snap_prev.get(k, 0), 3)
                 for k in snap
                 if snap.get(k, 0) - snap_prev.get(k, 0) > 0.005}
        snap_prev = snap
        per_chunk.append((i, round(dt, 3), delta,
                          bool(mm.merges), dict(bank.followers)))
        i += CHUNK
    t0 = time.perf_counter()
    bank.flush()
    print("flush_s", round(time.perf_counter() - t0, 3))
    bank.sync_to_trackers()
    mm.flush_merge_scans()

    for rec in per_chunk:
        print(json.dumps({"i": rec[0], "chunk_s": rec[1], "merged": rec[3],
                          "followers": {str(a): b for a, b in rec[4].items()},
                          "spans": rec[2]}))
    print("\n== aggregate span summary ==")
    for k, v in sorted(tr.stage_summary().items(),
                       key=lambda kv: -kv[1]["total_s"]):
        print(f"{k:28s} n={v['count']:4d} total={v['total_s']:8.3f}s "
              f"mean={v['mean_ms']:8.1f}ms max={v['max_ms']:8.1f}ms")
    print("merged:", bool(mm.merges),
          "states:", [t.state.name for t in robots])


if __name__ == "__main__":
    main()
