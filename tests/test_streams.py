"""Robot-parallel StreamBank tests on the 8-device virtual CPU mesh.

The reference's multi-robot story is N System thread-sets in one process
(mono_kitti_dif-Seq.cc:87-101); ours is a vmapped+sharded chunk step over a
robot axis (parallel/streams.py). These tests check (a) the bank tracks as
well as the single-stream chunk path and (b) the robot axis really shards
over a Mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orbslamm_tpu.eval.ate import ate_from_poses
from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import MonocularSession, TrackingState
from orbslamm_tpu.parallel import streams as ps
from orbslamm_tpu.utils.config import (
    CameraConfig,
    CapacityConfig,
    OrbConfig,
    SlamConfig,
    TrackingConfig,
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
    assert sess.state == TrackingState.OK, f"seed {seed} failed to initialize"
    return sess, seq, i


@pytest.mark.slow
def test_stream_bank_matches_single_stream():
    R = 4
    boots = [_bootstrap(seed) for seed in (7, 9, 13, 33)]
    start = max(b[2] for b in boots)
    # advance everyone (per-frame path) to a common start frame
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

    n_banked = (N_FRAMES - start) // CHUNK * CHUNK
    for sess, seq, i0 in boots:
        assert sess.tracker.state == TrackingState.OK
        ts, est = sess.frame_trajectory()
        # every frame from this robot's own initialization through the
        # banked chunks must have tracked (small slack for the init frame)
        expect = (start - i0) + n_banked
        assert len(est) >= expect - 2, (
            f"only {len(est)} of ~{expect} frames tracked"
        )
        idx = [int(round(t * CAM.fps)) for t in ts]
        ate = ate_from_poses(est, seq.poses_cw[idx])
        # monocular scale drift on this small scene varies by seed; the bound
        # catches gross failure (a broken bank lands >1) — accuracy bounds
        # live in the single-stream and merge tests
        assert ate < 0.6, f"bank ATE {ate:.3f}"
        assert sess.tracker.mapctx.n_kf >= 5

    # batch-width/sharding invariance: robot 0 re-run through a 1-robot
    # UNSHARDED bank (the same deferred chunk program, vmapped over R=1)
    # must produce a near-identical trajectory — the robot axis is
    # embarrassingly parallel, so width and sharding must not change the
    # math beyond f32 reduction-order noise
    sess0, seq0, i0 = _bootstrap(7)
    for j in range(i0, start):
        sess0.process_frame(seq0.images[j], float(seq0.timestamps[j]))
    bank1 = ps.StreamBank(CFG, [sess0.tracker], chunk_size=CHUNK)
    j = start
    while j + CHUNK <= N_FRAMES:
        bank1.process_chunk(
            np.stack(seq0.images[j : j + CHUNK])[None],
            np.asarray(seq0.timestamps[j : j + CHUNK])[None],
        )
        j += CHUNK
    bank1.sync_to_trackers()
    ts_a, est_a = boots[0][0].frame_trajectory()
    ts_b, est_b = sess0.frame_trajectory()
    assert len(est_a) == len(est_b)
    d = np.linalg.norm(est_a[:, :3, 3] - est_b[:, :3, 3], axis=-1)
    assert float(d.max()) < 0.05, f"4-bank vs 1-bank drift {d.max():.4f}"


def test_stream_state_is_sharded():
    """The stacked map state must actually shard its robot axis."""
    boots = [_bootstrap(seed) for seed in (7, 9)]
    mesh = Mesh(np.array(jax.devices()[:2]), ("r",))
    bank = ps.StreamBank(CFG, [b[0].tracker for b in boots], mesh=mesh)
    sh = bank.m_all.kf_pose.sharding
    assert sh.is_fully_replicated is False
    # two shards, one robot each
    assert len(sh.device_set) == 2


@pytest.mark.slow
def test_bank_cross_robot_merge_owner_follower():
    """Two bank robots traverse overlapping halves of ONE scene (the
    mono_kitti_dif-Seq / mono_tum split-sequence pattern): their separate
    maps must MERGE mid-run, after which both robots keep tracking in the
    shared map — the absorbed robot as a follower whose keyframes are
    replayed into the authoritative map at chunk boundaries."""
    from pathlib import Path

    from orbslamm_tpu.models.multimap import MultiMapper

    # long enough that BOTH maps pass the >10-keyframe scan gate
    # (MultiMapper.cc:106-120) with several deferred scan rounds to spare
    # before the sequences end
    n_total = 200
    seq = make_sequence(n_frames=n_total, n_points=2500, cam=CAM, seed=21,
                        motion="strafe")
    half = 152
    starts = [0, n_total - half]  # overlap = 2*half - n_total = 104 frames
    import dataclasses

    from orbslamm_tpu.utils.config import LoopConfig

    vocab = (Path(__file__).resolve().parents[1] / "orbslamm_tpu" / "data"
             / "vocab_10x4.npz")
    # lenient verification bars: this test validates the OWNER/FOLLOWER
    # machinery (pairing, replay, shared refresh), not borderline Sim3
    # verification at 320x240 — with reference-strength bars the organic
    # detection instant varies run-to-run on this marginal scene; the final
    # merged-map ATE assertion still catches a wrong merge
    cfg = CFG.replace(
        vocabulary_path=str(vocab) if vocab.exists() else None,
        loop=dataclasses.replace(
            LoopConfig(), min_sim3_inliers=10, min_bow_matches=10,
            min_kfs_for_merge=6,
        ),
    )
    mm = MultiMapper(cfg)
    robots = [mm.add_robot(f"r{k}") for k in range(2)]

    # bootstrap each robot on its own slice via the per-frame path
    offs = []
    for k, t in enumerate(robots):
        i = 0
        while t.state != TrackingState.OK and i < half:
            mm.process_frame(k, seq.images[starts[k] + i],
                             float(seq.timestamps[starts[k] + i]))
            i += 1
        assert t.state == TrackingState.OK, f"robot {k} failed to initialize"
        offs.append(i)
    start = max(offs)
    for k, t in enumerate(robots):
        for j in range(offs[k], start):
            mm.process_frame(k, seq.images[starts[k] + j],
                             float(seq.timestamps[starts[k] + j]))

    # unsharded on purpose: sharded execution permutes f32 reduction orders,
    # which flips WHEN this marginal 320x240 scene's detection verifies —
    # the robot-axis sharding itself is covered by
    # test_stream_state_is_sharded / test_stream_bank_matches_single_stream;
    # this test pins the deterministic owner/follower machinery
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
        i += CHUNK
    bank.sync_to_trackers()
    mm.flush_merge_scans()  # drain the deferred scan pipeline

    # the two maps merged and the owner/follower machinery ran: the pairing
    # was established, the follower's keyframes were replayed into the
    # authoritative map at sync points, and the merged map is consistent.
    # (End-state is asserted through EVENTS, not final flags: on this
    # marginal 320x240 scene a robot may legitimately lose tracking near
    # the path's end and leave the pairing through the designed
    # new-map-on-loss path, Tracking.cc:330-366.)
    from orbslamm_tpu.utils.trace import get_tracer

    assert mm.merges, "no cross-map merge happened in the bank"
    tr = get_tracer()
    assert tr.events("bank_follower"), (
        "merge did not establish an owner/follower pair"
    )
    assert tr.events("bank_replay_kf"), (
        "no follower keyframes were replayed into the shared map"
    )
    # both robots kept contributing OK frames for the bulk of the run
    for k, t in enumerate(robots):
        ok = [f for f in t.frames if f.state == "OK"]
        assert len(ok) > 0.6 * half, f"{t.name}: only {len(ok)} OK frames"
    # merged-map trajectory accuracy: both robots' shared-map frames vs GT,
    # resolved through reference keyframes (ride all corrections)
    from orbslamm_tpu.models.system import resolve_frame_poses

    base_id = mm.merges[0][1]
    for k, t in enumerate(robots):
        ok = [f for f in t.frames if f.state == "OK" and f.map_id == base_id]
        assert len(ok) > 20, f"{t.name}: only {len(ok)} merged-map frames"
        est = np.stack(resolve_frame_poses(ok))
        idx = [int(round(f.timestamp * CAM.fps)) for f in ok]
        ate = ate_from_poses(est, seq.poses_cw[idx])
        assert ate < 0.6, f"{t.name} merged-map ATE {ate:.3f}"
