"""Fused per-frame step: the whole tracking+mapping frame in ONE jitted call.

The host-sequenced stage functions (tracking.py / local_mapping.py) are
correct but cost one device dispatch each plus host syncs for the control
decisions — fatal for real-time when the host↔device link has latency. This
module composes the SAME stage logic into a single jitted program:

    extract → motion-model track → local-map track → keyframe decision
    (on device) → lax.cond(mapping stages) → updated state + scalar summary

One dispatch in, one small summary pull out, per frame. Keyframe-rate events
(BoW update, loop closing, merging) remain host-driven off the ``new_kf``
flag in the summary — they are rare and control-flow heavy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models import tracking as trk
from orbslamm_tpu.ops import bow as bow_ops
from orbslamm_tpu.ops import geometry as geo
from orbslamm_tpu.ops.orb import Features
from orbslamm_tpu.utils.config import SlamConfig


class TrackState(NamedTuple):
    """Device-resident tracking state (the RobotTracker hot fields)."""

    T_cw: jax.Array  # [4,4]
    velocity: jax.Array  # [4,4]
    last_T: jax.Array  # [4,4]
    last_feats: Features
    last_lm: jax.Array  # [M]
    frames_since_kf: jax.Array  # i32
    peak_inliers: jax.Array  # i32
    prev_inliers: jax.Array  # i32 — last frame's inlier count (collapse gate)
    n_kf: jax.Array  # i32 — next keyframe slot
    # latched on the first failed frame: freezes tracking for the REST of a
    # chunked scan (no false recovery, no junk keyframes) until the host
    # state machine intervenes (reloc / new map) and rebuilds the state
    lost: jax.Array = None  # bool
    # carried [K,L] observation indicator: kf_obs_lm only changes at
    # keyframe inserts, so the expensive full rebuild (a [K,L]-sized
    # scatter) is avoided — insert refreshes one row and the mapping
    # stages maintain the rest (local_mapping.process_new_keyframe_cached)
    obs_ind: jax.Array = None  # [K,L] f32
    # pose of the NEWEST keyframe, carried so the per-frame reference-KF
    # decomposition (FrameSummary.ref_slot/T_rel) works mid-chunk in the
    # deferred body, where a just-minted keyframe's pose is not yet written
    # into m.kf_pose. Relative transforms are world-invariant, so a carried
    # copy is exact as long as it is rebased together with T_cw/last_T.
    last_kf_T: jax.Array = None  # [4,4]


class FrameSummary(NamedTuple):
    T_cw: jax.Array  # [4,4]
    n_inliers: jax.Array  # i32
    tracking_ok: jax.Array  # bool
    new_kf: jax.Array  # bool
    kf_slot: jax.Array  # i32 (valid when new_kf)
    # reference-keyframe pose decomposition (System.cc:470-499): the frame
    # pose is recorded RELATIVE to the newest keyframe (T_cw = T_rel @
    # T_ref), so trajectory export composes against the CURRENT corrected
    # keyframe pose and every frame rides later loop/GBA/merge corrections
    ref_slot: jax.Array = None  # i32 — keyframe slot the pose is relative to
    T_rel: jax.Array = None  # [4,4] camera-from-refKF
    # in-chunk loop-candidate scan (KeyFrameDatabase::DetectLoopCandidates
    # computed ON DEVICE at keyframe insertion — no extra dispatch/fetch):
    # [K] BoW similarity per database keyframe, -1 where inadmissible
    # (covisible / too recent / invalid); None when the step was built
    # without a vocabulary
    loop_scores: jax.Array | None = None
    loop_min_score: jax.Array | None = None  # minScore normalizer (f32)


class ChunkKFEvents(NamedTuple):
    """Keyframe events queued by a DEFERRED-mapping chunk (see
    make_multistream_chunk_step): mapping for these frames ran in the
    chunk's phase B, after all tracking."""

    j: jax.Array  # [E] frame index within the chunk, -1 = empty slot
    slot: jax.Array  # [E] keyframe slot
    loop_scores: jax.Array | None = None  # [E, K]
    loop_min_score: jax.Array | None = None  # [E]


def _make_insert_fns(cfg: SlamConfig, with_bow: bool, have_ind: bool):
    """The keyframe-insert + mapping-pipeline branch, shared by the
    synchronous in-scan path and the deferred phase-B path.

    Returns (insert, no_insert), each taking (voc, K, operand) with
    operand = (m, ind, kf_bow, feats, feat_lm, T_cw, frame_id, timestamp,
    slot) and returning (m, ind, kf_bow, loop_scores[K], loop_min)."""
    Kcap = cfg.capacity.max_keyframes
    min_gap = cfg.loop.kfs_between_loops

    def no_scores():
        return (jnp.full((Kcap,), -1.0, jnp.float32), jnp.float32(0.0))

    def insert(voc, K, operand):
        (m_in, ind_in, bow_in, feats_in, feat_lm_in, T_cw, frame_id,
         timestamp, slot) = operand
        m2 = ms.insert_keyframe(
            m_in, slot, T_cw, K, feats_in, feat_lm_in, frame_id, timestamp
        )
        # full mapping pipeline with the carried [K, L] indicator
        # threaded through all stages (triangulate → fuse → local BA →
        # landmark/keyframe culling)
        if have_ind:
            m3, ind3 = lm_stage.process_new_keyframe_cached(cfg, m2, slot, ind_in)
        else:
            m3, ind3 = lm_stage.process_new_keyframe(cfg, m2, slot), ind_in
        if not with_bow:
            return m3, ind3, bow_in, *no_scores()
        # BoW row of the new keyframe + loop-candidate scan, on device
        words = bow_ops.assign_words(voc, feats_in.desc, feats_in.valid)
        row = bow_ops.bow_vector(voc, words)
        bow2 = bow_in.at[slot].set(row)
        scores = bow_ops.bow_score(row, bow2)  # [K]
        conn = (ind3 @ ind3[slot]) > 0 if have_ind else (
            ms.covisibility(m3)[slot] > 0
        )
        ids = jnp.arange(Kcap, dtype=jnp.int32)
        allowed = (
            m3.kf_valid
            & (ids != slot)
            & ~conn
            & (ids < slot - min_gap + 1)
        )
        cov_scores = jnp.where(conn & m3.kf_valid, scores, jnp.inf)
        mn = jnp.minimum(jnp.min(cov_scores), 1.0)
        mn = jnp.where(jnp.isfinite(mn), mn, 0.05)
        return m3, ind3, bow2, jnp.where(allowed, scores, -1.0), mn

    def no_insert(voc, K, operand):
        m_in, ind_in, bow_in, *_ = operand
        return m_in, ind_in, bow_in, *no_scores()

    return insert, no_insert


def _make_frame_body(cfg: SlamConfig, extract_fn, with_bow: bool = False,
                     deferred: bool = False):
    """The traced per-frame body shared by the single-frame step and the
    chunked lax.scan step.

    The body accepts EITHER a raw image (extraction inlined — the
    single-frame path) or a precomputed Features (the chunked path, which
    batches extraction across the chunk outside the sequential scan).
    ``K`` is a step argument so the robot-parallel bank (parallel/streams)
    can vmap one program over robots with different calibrations
    (mono_kitti_dif-Seq runs KITTI 00 + 07 with different settings files).

    ``with_bow``: fold the keyframe-rate BoW work INTO the step — on
    keyframe insertion the new keyframe's BoW row is computed and written
    into the carried ``kf_bow`` database, and loop-candidate scores +
    minScore (KeyFrameDatabase::DetectLoopCandidates + LoopClosing.cc:131)
    are emitted in the FrameSummary. This removes the per-chunk host
    dispatches/fetches for place recognition entirely: the host only runs
    the (rare) Sim3 verification when a candidate clears the floor.

    ``deferred``: do NOT run the keyframe-insert/mapping branch inside the
    body — only make the keyframe DECISION (gated by the extra ``can_kf``
    argument: the chunk's event queue has room) and return the frame's
    landmark associations so the chunk can replay queued events through the
    mapping pipeline afterwards. This is what makes the body vmap-able at
    reasonable cost: under vmap ``lax.cond`` lowers to ``select`` (both
    branches execute for every frame), so the synchronous body pays the
    full mapping pipeline per FRAME; the deferred body pays it per EVENT
    (the reference's async LocalMapping consumes keyframes behind tracking
    the same way, LocalMapping.cc:114-126). The body then returns
    ``(m, ts, kf_bow, summary, feat_lm)``."""

    def step(m: ms.MapState, ts: TrackState, kf_bow, voc, image, frame_id,
             timestamp, K, allow_kf=True, can_kf=True):
        # allow_kf: traced bool; False = localization-only mode (reference
        # System::ActivateLocalizationMode / Tracking::mbOnlyTracking —
        # track against the frozen map, never insert keyframes)
        feats = image if isinstance(image, Features) else extract_fn(image)
        T_pred = ts.velocity @ ts.last_T
        r1 = trk.track_motion_model(
            cfg, m, feats, T_pred, K, ts.last_feats, ts.last_lm, T_last=ts.last_T
        )
        # fallback: too few motion inliers → retry local map from the last
        # pose with WIDE search windows — the TrackReferenceKeyFrame analog
        # (Tracking.cc:296-305,807): the reference BoW-matches the reference
        # keyframe because windowed projection fails under large motion; the
        # pool matcher with 8x windows is the batched equivalent (the map's
        # frustum-visible set is a superset of the reference KF's landmarks)
        weak = r1.n_inliers < cfg.tracking.min_inliers_track
        T_start = jnp.where(weak, ts.last_T, r1.T_cw)
        feat_lm0 = jnp.where(weak, jnp.full_like(r1.feat_lm, -1), r1.feat_lm)
        r2, m = trk.track_local_map(
            cfg, m, feats, T_start, K, feat_lm0,
            radius_scale=jnp.where(weak, 3.0, 1.0),
        )
        ok = (r2.n_inliers >= cfg.tracking.min_inliers_local_map) & (
            r2.n_inliers.astype(jnp.float32)
            >= cfg.tracking.min_track_inlier_ratio * r2.n_matches.astype(jnp.float32)
        )
        # a weak-frame recovery ran with widened windows (more aliasing
        # headroom): only trust it when it looks like a REAL re-lock —
        # either comparable support to the recent track record or a solidly
        # above-floor absolute count (the reference's TrackReferenceKeyFrame
        # likewise re-verifies with PoseOptimization, Tracking.cc:302)
        recovery_bar = jnp.minimum(
            0.5 * ts.prev_inliers.astype(jnp.float32),
            2.0 * cfg.tracking.min_inliers_local_map,
        )
        ok &= ~weak | (r2.n_inliers.astype(jnp.float32) >= recovery_bar)
        # sudden-collapse gate: a kidnap/teleport produces a cliff in the
        # inlier count even when chance (perceptual-aliasing) matches keep it
        # above the absolute floor — treat a >4x single-frame drop as loss
        ok &= r2.n_inliers.astype(jnp.float32) >= 0.25 * ts.prev_inliers.astype(
            jnp.float32
        )
        # once lost, stay lost for the rest of the chunk: recovery is a host
        # decision (relocalize / new map), not a lucky re-lock mid-scan
        was_lost = ts.lost if ts.lost is not None else jnp.asarray(False)
        ok &= ~was_lost
        lost_next = was_lost | ~ok

        peak = jnp.maximum(ts.peak_inliers, r2.n_inliers)
        fsk = ts.frames_since_kf + 1
        need_kf = ok & (
            (fsk >= cfg.tracking.new_kf_max_frames)
            | (
                (fsk >= 1)
                & (r2.n_inliers > 15)
                & (
                    r2.n_inliers.astype(jnp.float32)
                    < cfg.tracking.new_kf_tracked_ratio * peak.astype(jnp.float32)
                )
            )
        )
        need_kf &= ts.n_kf < cfg.capacity.max_keyframes - 1
        need_kf &= jnp.asarray(allow_kf)
        # never mint a keyframe from a wide-window recovery frame: its
        # associations carry extra aliasing risk (junk keyframes poison
        # triangulation and the BoW database)
        need_kf &= ~weak
        if deferred:
            # backpressure: the chunk's event queue is full — the reference's
            # SetAcceptKeyFrames(false) makes Tracking skip insertion the
            # same way (LocalMapping.cc:90, Tracking.cc:1049)
            need_kf &= jnp.asarray(can_kf)
        slot = ts.n_kf

        have_ind = ts.obs_ind is not None
        if deferred:
            ind = ts.obs_ind
            lscores = lmin = None
        else:
            insert, no_insert = _make_insert_fns(cfg, with_bow, have_ind)
            ind0 = ts.obs_ind if have_ind else jnp.zeros((), jnp.float32)
            m, ind, kf_bow, lscores, lmin = jax.lax.cond(
                need_kf,
                functools.partial(insert, voc, K),
                functools.partial(no_insert, voc, K),
                (m, ind0, kf_bow, feats, r2.feat_lm, r2.T_cw, frame_id,
                 timestamp, slot),
            )

        # state update (frozen when tracking failed — host decides LOST)
        T_new = r2.T_cw
        # reference-KF decomposition: relative to the newest keyframe BEFORE
        # this frame (or to this frame's own new keyframe → identity); the
        # carried last_kf_T covers keyframes minted earlier in this chunk
        ref_prev = jnp.maximum(ts.n_kf - 1, 0)
        last_kf_T = ts.last_kf_T if ts.last_kf_T is not None else m.kf_pose[ref_prev]
        ref_slot = jnp.where(need_kf, slot, ref_prev)
        T_rel = jnp.where(
            need_kf, jnp.eye(4), T_new @ geo.T_inv(last_kf_T)
        )
        vel = T_new @ geo.T_inv(ts.last_T)
        ts_next = TrackState(
            T_cw=jnp.where(ok, T_new, ts.T_cw),
            velocity=jnp.where(ok, vel, ts.velocity),
            last_T=jnp.where(ok, T_new, ts.last_T),
            last_feats=jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(ok, (1,) * new.ndim), new, old
                ),
                feats,
                ts.last_feats,
            ),
            last_lm=jnp.where(ok, r2.feat_lm, ts.last_lm),
            frames_since_kf=jnp.where(need_kf, 0, jnp.where(ok, fsk, ts.frames_since_kf)),
            peak_inliers=jnp.where(need_kf, r2.n_inliers, jnp.where(ok, peak, ts.peak_inliers)),
            prev_inliers=jnp.where(ok, r2.n_inliers, ts.prev_inliers),
            n_kf=jnp.where(need_kf, ts.n_kf + 1, ts.n_kf),
            lost=lost_next,
            obs_ind=ind if have_ind else None,
            # the synchronous body refreshes the carried reference-KF pose
            # from the POST-mapping map (local BA refined it inside the
            # insert branch); the deferred body inserts in phase B, which
            # re-syncs last_kf_T itself after its mapping replay
            last_kf_T=(
                jnp.where(
                    need_kf,
                    T_new if deferred else m.kf_pose[slot],
                    last_kf_T,
                )
                if ts.last_kf_T is not None else None
            ),
        )
        summary = FrameSummary(
            T_cw=T_new,
            n_inliers=r2.n_inliers,
            tracking_ok=ok,
            new_kf=need_kf,
            kf_slot=slot,
            ref_slot=ref_slot,
            T_rel=T_rel,
            loop_scores=lscores if (with_bow and not deferred) else None,
            loop_min_score=lmin if (with_bow and not deferred) else None,
        )
        if deferred:
            return m, ts_next, kf_bow, summary, r2.feat_lm
        return m, ts_next, kf_bow, summary

    return step


@jax.jit
def rebase_track_state(ts: TrackState, T_kf_old: jax.Array,
                       T_kf_new: jax.Array) -> TrackState:
    """Re-express the device tracking state after a loop correction moved
    the map: camera poses ride the corrected keyframe via the relative
    chain T_rel = T_cw @ inv(T_kf_old), T_cw' = T_rel @ T_kf_new (the
    reference recovers frame poses the same way, System.cc:470-499)."""
    A = geo.T_inv(T_kf_old) @ T_kf_new
    return ts._replace(
        T_cw=ts.T_cw @ A,
        last_T=ts.last_T @ A,
        last_kf_T=ts.last_kf_T @ A if ts.last_kf_T is not None else None,
    )


def make_frame_step(cfg: SlamConfig, extract_fn, K: jax.Array):
    """Build the fused jitted step.

    extract_fn: the jitted single-image ORB extractor (inlined at trace).
    Returns step(m, ts, image, frame_id, timestamp) -> (m, ts, FrameSummary).
    """
    body = _make_frame_body(cfg, extract_fn)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(m, ts, image, frame_id, timestamp, allow_kf=True):
        m, ts, _, summary = body(
            m, ts, jnp.zeros((), jnp.float32), None, image, frame_id,
            timestamp, K, allow_kf,
        )
        return m, ts, summary

    return step


def make_chunk_step(cfg: SlamConfig, extract_fn, K: jax.Array,
                    with_bow: bool = False):
    """Build the CHUNKED fused step: lax.scan of the frame body over a batch
    of N frames, ONE dispatch + ONE host sync per chunk.

    Rationale: on a remote-attached TPU every host sync costs a full network
    round trip (~30 ms on the axon tunnel), which caps any one-sync-per-frame
    design at ~linerate/RTT. Scanning N frames per dispatch amortizes the RTT
    N-fold; keyframe-rate host events (loop closing, merging) are handled
    after the chunk from the stacked summaries — the same delayed semantics
    as the reference's async LoopClosing/MultiMapper queues
    (LoopClosing.cc:96-107). With ``with_bow`` the BoW database update and
    loop-candidate scan also ride inside the program (see _make_frame_body).

    Returns step(m, ts, kf_bow, voc, images[N,H,W], frame_ids[N],
    timestamps[N], allow_kf) -> (m, ts, kf_bow, FrameSummary stacked along
    axis 0).
    """
    body = _make_frame_body(cfg, extract_fn, with_bow=with_bow)

    # NOTE: only the map (and BoW database) are donated — TrackState fields
    # routinely alias each other on the host side (T_cw is last_T right
    # after init), and donating an aliased buffer twice is an error
    donate = (0, 2) if with_bow else (0,)

    @functools.partial(jax.jit, donate_argnums=donate)
    def chunk(m: ms.MapState, ts: TrackState, kf_bow, voc, images, frame_ids,
              timestamps, allow_kf=True):
        return _chunk_body(body, extract_fn, m, ts, kf_bow, voc, images,
                           frame_ids, timestamps, K, allow_kf)

    return chunk


def _chunk_body(body, extract_fn, m, ts, kf_bow, voc, images, frame_ids,
                timestamps, K, allow_kf):
    """Shared chunk logic: batched extraction + sequential tracking scan."""
    # extraction is per-frame INDEPENDENT: batch it across the chunk
    # (vmap → one [N,...] pyramid/FAST/descriptor program with N-fold
    # better MXU/VPU utilization) and scan only the inherently
    # sequential tracking chain
    feats_all = jax.vmap(extract_fn)(images)

    def scan_body(carry, inp):
        m, ts, kf_bow = carry
        feats, fid, t = inp
        m, ts, kf_bow, summary = body(m, ts, kf_bow, voc, feats, fid, t, K,
                                      allow_kf)
        return (m, ts, kf_bow), summary

    (m, ts, kf_bow), summaries = jax.lax.scan(
        scan_body, (m, ts, kf_bow), (feats_all, frame_ids, timestamps)
    )
    return m, ts, kf_bow, summaries


def _chunk_body_deferred(cfg, body, extract_fn, m, ts, kf_bow, voc, images,
                         frame_ids, timestamps, K, allow_kf,
                         with_bow: bool, kmax: int, seg_len: int = 4):
    """Segmented two-phase chunk: the chunk is split into ceil(C/seg_len)
    SEGMENTS, each a tracking scan (phase A, queueing at most ``kmax``
    keyframe events) followed by a mapping replay of its queue (phase B).

    Built for the robot-vmapped multistream step: under vmap every
    ``lax.cond`` lowers to ``select`` and BOTH branches execute, so the
    synchronous in-scan mapping branch costs chunk_size× the mapping
    pipeline per robot; here it costs (segments × kmax)× (≈ the actual
    keyframe rate). Segmenting bounds the LANDMARK LATENCY — a keyframe's
    triangulated landmarks become trackable within ``seg_len`` frames
    instead of a whole chunk, which is what keeps fast-moving streams from
    starving mid-chunk. Semantics follow the reference's ASYNC
    LocalMapping: frames track against the map as of their segment start,
    and queued keyframes are consumed in order at the segment boundary
    (LocalMapping.cc:114-126; keyframe backpressure Tracking.cc:1049)."""
    feats_all = jax.vmap(extract_fn)(images)
    C = frame_ids.shape[0]
    seg_len = min(seg_len, C)
    assert C % seg_len == 0, "chunk size must be a multiple of seg_len"
    n_seg = C // seg_len
    have_ind = ts.obs_ind is not None
    insert, no_insert = _make_insert_fns(cfg, with_bow, have_ind)

    def scan_body(carry, inp):
        m, ts, kf_bow, ev_n, ev_j, ev_slot = carry
        feats, fid, t, j = inp
        can_kf = ev_n < kmax
        m, ts, kf_bow, summary, feat_lm = body(
            m, ts, kf_bow, voc, feats, fid, t, K, allow_kf, can_kf
        )
        new = summary.new_kf
        ev_j = ev_j.at[ev_n].set(jnp.where(new, j, ev_j[ev_n]))
        ev_slot = ev_slot.at[ev_n].set(
            jnp.where(new, summary.kf_slot, ev_slot[ev_n])
        )
        ev_n = ev_n + new.astype(jnp.int32)
        return (m, ts, kf_bow, ev_n, ev_j, ev_slot), (summary, feat_lm)

    sum_parts, ev_parts = [], []
    for g in range(n_seg):
        lo = g * seg_len
        sl = slice(lo, lo + seg_len)
        feats_seg = jax.tree.map(lambda a: a[sl], feats_all)
        ev_j0 = jnp.full((kmax,), -1, jnp.int32)
        ev_slot0 = jnp.zeros((kmax,), jnp.int32)
        (m, ts, kf_bow, _, ev_j, ev_slot), (summaries, feat_lm_all) = (
            jax.lax.scan(
                scan_body,
                (m, ts, kf_bow, jnp.int32(0), ev_j0, ev_slot0),
                (feats_seg, frame_ids[sl], timestamps[sl],
                 jnp.arange(lo, lo + seg_len, dtype=jnp.int32)),
            )
        )

        # phase B: consume the segment's event queue in order (conditional
        # per event — cond-as-select costs kmax× mapping under vmap).
        # Landmark occupancy before any event: a later event's associations
        # were captured in phase A, and an EARLIER event's culling may have
        # freed (and its triangulation reused) those slots — keep only
        # associations to landmarks alive both at queue time and now.
        ind0 = ts.obs_ind if have_ind else jnp.zeros((), jnp.float32)
        lm_valid_start = m.lm_valid

        def ev_body(carry, e, ev_j=ev_j, ev_slot=ev_slot,
                    summaries=summaries, feat_lm_all=feat_lm_all,
                    lm_valid_start=lm_valid_start, lo=lo):
            m, ind, kf_bow = carry
            j = ev_j[e]
            valid = j >= 0
            jj = jnp.maximum(j - lo, 0)  # segment-local index
            feats_e = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.maximum(j, 0), keepdims=False
                ),
                feats_all,
            )
            fl = feat_lm_all[jj]
            safe = jnp.maximum(fl, 0)
            fl = jnp.where(
                (fl >= 0) & lm_valid_start[safe] & m.lm_valid[safe], fl, -1
            )
            operand = (m, ind, kf_bow, feats_e, fl,
                       summaries.T_cw[jj], frame_ids[jnp.maximum(j, 0)],
                       timestamps[jnp.maximum(j, 0)], ev_slot[e])
            m, ind, kf_bow, scores, mn = jax.lax.cond(
                valid,
                functools.partial(insert, voc, K),
                functools.partial(no_insert, voc, K),
                operand,
            )
            return (m, ind, kf_bow), (scores, mn)

        (m, ind, kf_bow), (ev_scores, ev_min) = jax.lax.scan(
            ev_body, (m, ind0, kf_bow), jnp.arange(kmax)
        )
        if have_ind:
            ts = ts._replace(obs_ind=ind)
        if ts.last_kf_T is not None:
            # re-sync the carried reference-KF pose with its POST-mapping
            # value: phase B's local BA refined the inserted keyframes, and
            # later frames' T_rel must compose against the refined pose or
            # export-time resolution inherits the stale-vs-refined delta
            ts = ts._replace(
                last_kf_T=m.kf_pose[jnp.maximum(ts.n_kf - 1, 0)]
            )
        sum_parts.append(summaries)
        ev_parts.append(ChunkKFEvents(
            j=ev_j,
            slot=ev_slot,
            loop_scores=ev_scores if with_bow else None,
            loop_min_score=ev_min if with_bow else None,
        ))

    summaries = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *sum_parts
    )
    events = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *ev_parts
    )
    return m, ts, kf_bow, summaries, events
