"""Shared example-driver machinery (the reference Examples/Monocular drivers).

Replicates the reference driver behavior (mono_tum.cc / mono_kitti.cc /
mono_kitti_dif-Seq.cc, SURVEY.md §2.4): pump one or more image sequences
through robots sharing a MultiMapper, report per-frame tracking timing
(median/mean, mono_kitti_dif-Seq.cc:213-221), and save TUM/KITTI trajectories
plus the map set.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import dataclasses

from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.io import trajectory as tio
from orbslamm_tpu.utils.config import SlamConfig
from orbslamm_tpu.utils.trace import get_tracer


def autodetect_image_size(cfg: SlamConfig, sample_image) -> SlamConfig:
    """Reference settings YAMLs carry no image dimensions (cv::Mat knows its
    own size); our static-shape extractor needs them — take them from the
    first frame."""
    h, w = sample_image.shape[:2]
    if (cfg.camera.height, cfg.camera.width) != (h, w):
        cam = dataclasses.replace(cfg.camera, height=h, width=w)
        cfg = dataclasses.replace(cfg, camera=cam)
    return cfg


@dataclass
class RobotFeed:
    """One robot's image stream: any iterable of (timestamp, image)."""

    frames: object  # iterable of (float, np.ndarray) or ImageSequence
    name: str = ""


@dataclass
class RunReport:
    track_times: dict = field(default_factory=dict)  # name -> [s]
    states: dict = field(default_factory=dict)

    def timing_summary(self) -> dict:
        out = {}
        for name, ts in self.track_times.items():
            if ts:
                arr = np.asarray(ts[3:] or ts)  # skip compile-dominated frames
                out[name] = {
                    "median_s": float(np.median(arr)),
                    "mean_s": float(np.mean(arr)),
                    "fps": float(1.0 / max(np.median(arr), 1e-9)),
                }
        return out


def run_robots(
    cfg: SlamConfig,
    feeds: list[RobotFeed],
    out_dir: str | Path | None = None,
    pace_real_time: bool = False,
    verbose: bool = True,
    span_chunks: int = 4,
    viewer_port: int | None = None,
) -> tuple[MultiMapper, RunReport]:
    """Run all feeds round-robin through a shared MultiMapper (the reference
    runs one thread per robot; interleaving reproduces concurrency).

    Frames are pulled in SPANS of ``span_chunks * chunk_size`` per robot per
    round and processed through the PIPELINED chunked path
    (MultiMapper.process_frames): while tracking is OK, chunk k+1 is
    dispatched before chunk k's summaries are fetched, so the driver hits
    the same throughput as bench.py. Per-frame times are span time / frames
    (the reference's per-frame timing statistics stay comparable,
    mono_kitti_dif-Seq.cc:213-221). ``pace_real_time`` sleeps the span's
    remaining real-time budget, pacing like the reference drivers
    (mono_tum.cc:211-219).
    """
    get_tracer().reset()  # a second run in the same process starts clean
    mm = MultiMapper(cfg)
    iters = []
    for i, feed in enumerate(feeds):
        name = feed.name or f"robot{i}"
        mm.add_robot(name)
        iters.append((name, iter(feed.frames)))

    viewer = None
    if viewer_port:
        from orbslamm_tpu.io.viewer import LiveViewer

        viewer = LiveViewer(mm, port=viewer_port).start()
        if verbose:
            print(f"[driver] live viewer at http://127.0.0.1:{viewer_port}/")
    report = RunReport()
    for name, _ in iters:
        report.track_times[name] = []
        report.states[name] = []

    live = list(range(len(iters)))
    frame_no = 0
    while live:
        for idx in list(live):
            name, it = iters[idx]
            span = max(1, span_chunks * mm.robots[idx].chunk_size)
            stamps, imgs = [], []
            for _ in range(span):
                try:
                    ts, img = next(it)
                except StopIteration:
                    live.remove(idx) if idx in live else None
                    break
                stamps.append(float(ts))
                imgs.append(img)
            if not imgs:
                continue
            t0 = time.perf_counter()
            recs = mm.process_frames(idx, imgs, stamps)
            dt = time.perf_counter() - t0
            per_frame = dt / len(imgs)
            report.track_times[name].extend([per_frame] * len(imgs))
            report.states[name].extend(r.state for r in recs)
            if pace_real_time and cfg.camera.fps > 0:
                sleep = len(imgs) / cfg.camera.fps - dt
                if sleep > 0:
                    time.sleep(sleep)
        frame_no += 1
        if verbose and frame_no % 4 == 0:
            print(f"[driver] span {frame_no}: {mm.summary()}")

    # drain the deferred merge-scan pipeline (the reference's shutdown
    # barrier lets MultiMapper finish its in-flight scan, MultiMapper.cc:954)
    mm.flush_merge_scans()
    if viewer is not None:
        viewer.stop()
    if out_dir is not None:
        save_outputs(mm, out_dir)
    if verbose:
        for name, s in report.timing_summary().items():
            print(
                f"[driver] {name}: median track {s['median_s']*1e3:.1f} ms, "
                f"mean {s['mean_s']*1e3:.1f} ms ({s['fps']:.1f} fps)"
            )
        print(f"[driver] final: {mm.summary()}")
        stages = get_tracer().stage_summary()
        for name in ("track", "local_mapping", "loop_detect", "loop_correct",
                     "merge_scan", "merge"):
            if name in stages:
                s = stages[name]
                print(f"[trace] {name}: n={s['count']} median={s['median_ms']}ms "
                      f"p90={s['p90_ms']}ms total={s['total_s']}s")
    return mm, report


def save_outputs(mm: MultiMapper, out_dir: str | Path) -> None:
    """Trajectories (TUM + KITTI formats, per robot), maps, and a rendering —
    the reference's SaveTrajectory* + SaveMultipleMapsTrajectories analog."""
    from orbslamm_tpu.io import serialize, viz

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from orbslamm_tpu.models.system import resolve_frame_poses

    for r in mm.robots:
        ok = [f for f in r.frames if f.state == "OK"]
        if ok:
            stamps = np.asarray([f.timestamp for f in ok])
            # save-time reconstruction through reference keyframes
            # (System.cc:470-499): frames ride all corrections
            poses = np.stack(resolve_frame_poses(ok))
            tio.save_tum(out / f"{r.name}_frames_tum.txt", stamps, poses)
            tio.save_kitti(out / f"{r.name}_frames_kitti.txt", poses)
    for mc in mm.live_maps():
        kv = np.asarray(mc.map.kf_valid)
        if kv.sum():
            poses = np.asarray(mc.map.kf_pose)[kv]
            stamps = np.asarray(mc.map.kf_timestamp)[kv]
            order = np.argsort(stamps)
            tio.save_tum(
                out / f"map{mc.map_id}_keyframes_tum.txt", stamps[order], poses[order]
            )
            viz.draw_map(mc.map, out / f"map{mc.map_id}.png",
                         title=f"map {mc.map_id}")
    serialize.save_session(out / "maps", mm)
    tr = get_tracer()
    tr.save_report(out / "trace_report.json")
    tr.save_events(out / "events.jsonl")
