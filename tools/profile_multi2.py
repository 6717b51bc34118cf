"""Dev-only: pure device-time comparison of the single-robot fused chunk
step vs the 2-robot vmapped multistream step (same config as bench.py)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import bench
from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.models.system import TrackingState
from orbslamm_tpu.parallel import streams as ps


def main():
    import dataclasses

    cfg = bench._cfg()
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
    for k, t in enumerate(robots):
        i, streak = 0, 0
        while streak < 3 and i < half // 2:
            r = mm.process_frame(k, seq.images[starts[k] + i],
                                 float(seq.timestamps[starts[k] + i]))
            streak = streak + 1 if r.state == "OK" else 0
            i += 1
        assert t.state == TrackingState.OK
    start = 24

    # --- single-robot chunk step steady-state (robot 0, host path) -------
    t0r = robots[0]
    t0r.chunk_size = CHUNK
    imgs1 = seq.images[start:start + CHUNK]
    st1 = seq.timestamps[start:start + CHUNK]
    tok = t0r._dispatch_chunk(imgs1, st1)
    t0r._finish_chunk(tok)  # compile + advance
    times1 = []
    for rep in range(6):
        j = start + CHUNK * (rep + 1)
        t0 = time.perf_counter()
        tok = t0r._dispatch_chunk(seq.images[j:j + CHUNK],
                                  seq.timestamps[j:j + CHUNK])
        recs = t0r._finish_chunk(tok)
        times1.append(time.perf_counter() - t0)
    print("single chunk s:", [round(x, 3) for x in times1],
          "median", round(float(np.median(times1)), 3))

    # --- 2-robot vmapped step ------------------------------------------
    bank = ps.StreamBank(cfg, robots, chunk_size=CHUNK)

    def chunk_at(i):
        imgs = np.stack([
            np.stack(seq.images[starts[k] + i:starts[k] + i + CHUNK])
            for k in range(2)
        ])
        stamps = np.stack([
            seq.timestamps[starts[k] + i:starts[k] + i + CHUNK]
            for k in range(2)
        ])
        return imgs, stamps

    i = start + CHUNK * 7
    imgs, stamps = chunk_at(i)
    t0 = time.perf_counter()
    tok = bank._dispatch(imgs, stamps)
    print("vmapped compile+dispatch s:", round(time.perf_counter() - t0, 1))
    jax.block_until_ready(tok["summaries"].T_cw)
    bank._pending = tok
    bank.flush()
    i += CHUNK
    times2 = []
    timesd = []
    timesf = []
    while i + CHUNK <= half and len(times2) < 6:
        imgs, stamps = chunk_at(i)
        t0 = time.perf_counter()
        tok = bank._dispatch(imgs, stamps)
        td = time.perf_counter() - t0
        recs = bank._finish(tok)
        times2.append(time.perf_counter() - t0)
        timesd.append(td)
        i += CHUNK
    print("vmapped chunk s:", [round(x, 3) for x in times2],
          "median", round(float(np.median(times2)), 3))
    print("  dispatch part:", [round(x, 3) for x in timesd])
    from orbslamm_tpu.utils.trace import get_tracer
    for k, v in sorted(get_tracer().stage_summary().items(),
                       key=lambda kv: -kv[1]["total_s"])[:8]:
        print(f"{k:26s} n={v['count']:4d} total={v['total_s']:8.3f}s "
              f"max={v['max_ms']:8.1f}ms")


if __name__ == "__main__":
    main()
