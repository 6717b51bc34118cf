"""Robot-parallel stream bank: R SLAM streams stepped in ONE sharded dispatch.

The reference runs one ``System`` (a set of threads) per robot inside a
single process, sharing one MultiMapper (mono_kitti_dif-Seq.cc:87-101;
SURVEY.md §2.3 P7). The TPU-native counterpart is data parallelism over a
robot axis:

  * each robot's (MapState, TrackState, K) pytrees are STACKED along a
    leading ``[R, ...]`` axis and sharded over a ``jax.sharding.Mesh``
    (robots are independent between merges — zero collectives on the hot
    path, so scaling efficiency is bounded only by load balance);
  * the fused chunk step (models/fused) is vmapped over that axis: one
    jitted dispatch advances EVERY stream by ``chunk_size`` frames;
  * keyframe-rate host events (BoW database rows, loop closing, cross-map
    merge scans) run per robot off the fetched summaries, exactly like the
    single-stream chunk path — rare, control-heavy, host-coordinated.

Pipelining and epoch safety: chunk k+1 is ALWAYS dispatched before chunk
k's summaries are fetched (the device never idles). Rare host events are
reconciled without breaking the pipeline:

  * same-map loop corrections REBASE the in-flight chunk (device state and
    its pending record poses ride the corrected keyframe — the reference's
    Tcr reference-chain trick, System.cc:470-499);
  * overlapped GBA slices are async device-program rewrites of the
    robot's CURRENT slice (the same lineage the in-flight chunk produces),
    with their convergence cost fetched one boundary late;
  * follower keyframes accumulate in a backlog replayed at periodic SYNC
    POINTS (one pipeline drain every ``replay_interval`` chunks) through a
    single jitted multi-keyframe program;
  * merges bump the affected robots' GENERATION, which marks the in-flight
    chunk stale: its records are emitted under the pre-merge map id, but no
    state machine / keyframe events run off it (the single-stream
    _finish_chunk stale guard, applied per robot).

Constraints: all streams must share the image size and ORB config (one
compiled extractor); per-robot calibration K MAY differ (it is a vmapped
argument — the reference's KITTI 00 + 07 demo uses two settings files).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import fused
from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models.fused import FrameSummary, TrackState
from orbslamm_tpu.ops import bow as bow_ops
from orbslamm_tpu.utils.config import SlamConfig
from orbslamm_tpu.utils.trace import get_tracer


def make_multistream_chunk_step(cfg: SlamConfig, extract_fn,
                                with_bow: bool = False, kmax: int = 2):
    """jit(vmap(chunk)) over a leading robot axis.

    Returns step(m[R,...], ts[R,...], kf_bow[R,K,W], K[R,3,3],
    images[R,C,H,W], frame_ids[R,C], timestamps[R,C], allow_kf[R], voc) ->
    (m, ts, kf_bow, summaries[R,C], kf_events[R,kmax]). With ``with_bow``
    the per-keyframe BoW database update + loop-candidate scan ride inside
    the program (the shared vocabulary broadcasts across the robot axis);
    without it, ``kf_bow`` is an [R] dummy passed through.

    Uses the DEFERRED-mapping chunk body: under the robot vmap ``lax.cond``
    lowers to ``select`` (both branches run for every frame), so the
    synchronous body would pay the keyframe mapping pipeline chunk_size×
    per robot — measured 7x the single-stream chunk cost. The deferred body
    tracks all frames first and replays at most ``kmax`` queued keyframe
    events through mapping afterwards (fused._chunk_body_deferred)."""
    body = fused._make_frame_body(cfg, extract_fn, with_bow=with_bow,
                                  deferred=True)

    def one_robot(m, ts, kf_bow, K, images, frame_ids, timestamps, allow_kf,
                  voc):
        return fused._chunk_body_deferred(
            cfg, body, extract_fn, m, ts, kf_bow, voc,
            images, frame_ids, timestamps, K, allow_kf, with_bow, kmax,
        )

    vm = jax.vmap(one_robot, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
    return functools.partial(jax.jit, donate_argnums=(0, 1, 2))(vm)


def stack_trees(trees):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def tree_slice(tree, r: int):
    return jax.tree.map(lambda x: x[r], tree)


def tree_set(tree, r: int, sub):
    return jax.tree.map(lambda all_, one: all_.at[r].set(one), tree, sub)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_slices_broadcast(all_tree, idxs, one):
    """Write ONE pytree into several leading-axis slices in a single
    dispatch (a.at[idxs].set broadcasts) — the eager per-leaf tree_set path
    costs ~#leaves dispatches per member, which dominates the post-merge
    shared refresh on a remote-attached device."""
    return jax.tree.map(lambda a, o: a.at[idxs].set(o[None]), all_tree, one)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_slices_stacked(all_tree, idxs, stacked):
    """Write a stacked [n, ...] pytree into slices ``idxs`` in one dispatch."""
    return jax.tree.map(lambda a, s: a.at[idxs].set(s), all_tree, stacked)


@functools.partial(jax.jit, static_argnames=("cfg", "with_bow"))
def _replay_kfs_device(cfg: SlamConfig, mA: ms.MapState, bowA, voc,
                       mB: ms.MapState, src_slots, base_valid, n_kf0,
                       n_allowed, with_bow: bool):
    """Replay up to P follower keyframes into the authoritative map in ONE
    jitted program (replaces a per-keyframe host insert chain — each host
    insert is several dispatches, fatal on a remote-attached device).

    src_slots [P] (padded -1): keyframe slots in the follower's chunk-epoch
    copy ``mB``; they are inserted at n_kf0.. of ``mA`` with a light
    pipeline (insert + seam fuse — the full pipeline already ran in the
    copy), keeping only landmark associations that exist in the
    authoritative pool AND existed at the last shared refresh (later ids
    alias follower-copy allocations). Returns (mA, bowA, obs_ind)."""
    P = src_slots.shape[0]
    from orbslamm_tpu.ops.orb import Features

    def body(carry, e):
        mA, n_kf = carry
        src = src_slots[e]
        do = (src >= 0) & (e < n_allowed) & (
            n_kf < cfg.capacity.max_keyframes - 1
        )

        def ins(operand):
            mA, n_kf = operand
            sl = jnp.maximum(src, 0)
            feats = Features(
                xy=mB.kf_xy[sl],
                xy_raw=mB.kf_xy[sl],
                angle=mB.kf_angle[sl],
                response=jnp.where(mB.kf_feat_valid[sl], 50.0, 0.0),
                level=mB.kf_level[sl],
                desc=mB.kf_desc[sl],
                valid=mB.kf_feat_valid[sl],
                u_right=mB.kf_ur[sl],
            )
            obs = mB.kf_obs_lm[sl]
            safe = jnp.maximum(obs, 0)
            keep = (obs >= 0) & mA.lm_valid[safe] & base_valid[safe]
            obs = jnp.where(keep, obs, -1)
            m2 = ms.insert_keyframe(
                mA, n_kf, mB.kf_pose[sl], mB.kf_K[sl], feats, obs,
                mB.kf_frame_id[sl], mB.kf_timestamp[sl],
            )
            m2 = lm_stage.fuse_neighbors(cfg, m2, n_kf)
            return m2, n_kf + 1

        mA, n_kf = jax.lax.cond(do, ins, lambda o: o, (mA, n_kf))
        return (mA, n_kf), None

    (mA, n_kf), _ = jax.lax.scan(
        body, (mA, n_kf0), jnp.arange(P, dtype=jnp.int32)
    )
    if with_bow:
        # batched BoW rows for the inserted slots (idempotent clamp: with
        # zero inserts the update would touch a non-inserted row, so gate)
        n_ins = n_kf - n_kf0
        rows = jnp.minimum(n_kf0 + jnp.arange(P, dtype=jnp.int32), n_kf - 1)
        bowA = jax.lax.cond(
            n_ins > 0,
            lambda b: bow_ops.update_bow_rows(
                voc, mA.kf_desc, mA.kf_feat_valid, b, rows
            ),
            lambda b: b,
            bowA,
        )
    return mA, bowA


def shard_streams(tree, mesh, axis: str | None = None):
    """Place every leaf with its leading (robot) axis sharded over ``mesh``.

    Plain device_put with a NamedSharding — XLA then propagates the sharding
    through the jitted step, compiling a per-device program that advances
    R/len(mesh) robots with no collectives. ``axis`` defaults to the mesh's
    first axis name."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis is None:
        axis = mesh.axis_names[0]

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


class StreamBank:
    """Drives R bootstrapped RobotTrackers through the vmapped chunk step.

    Usage: bootstrap each robot on the host per-frame path until it reaches
    TrackingState.OK (two-view initialization is a rare, host-decided
    event), then ``bank = StreamBank(cfg, trackers, mesh=...)`` and call
    ``bank.process_chunk(images[R,C], stamps[R,C])`` repeatedly.
    ``bank.sync_to_trackers()`` writes device state back into the trackers
    for trajectory export / merging.

    Loss handling: a robot that loses tracking keeps a frozen slice in the
    bank (the chunk body's latched ``lost`` flag makes its frames no-ops)
    while the HOST per-frame path takes over its images — the ``on_lost``
    hook (wire it to MultiMapper new-map-on-loss, Tracking.cc:330-366)
    decides recovery, and once the robot is OK again its fresh state is
    re-adopted into the bank.

    Cross-robot merges (the KITTI 00+07 production configuration,
    MultiMapper.cc:451-665): when two in-bank robots end up on ONE merged
    MapContext, the bank switches to an OWNER + FOLLOWER model — the robot
    whose map absorbed the other keeps the authoritative map in its slice;
    the follower tracks (and keeps inserting keyframes) in an epoch COPY.
    Its new keyframes accumulate in a backlog and are replayed into the
    authoritative map at SYNC POINTS (every ``replay_interval`` chunks):
    the pipeline drains once, ONE jitted multi-keyframe replay program
    (_replay_kfs_device) inserts the backlog, and every member's slice is
    refreshed from the authoritative state. Between sync points the bank
    stays fully pipelined — chunk k+1 is always in flight while chunk k's
    events are handled; GBA slices and same-map loop corrections are
    expressed as device-program rewrites of the CURRENT slices (the same
    lineage the in-flight chunk produces), so nothing is ever discarded.
    The replay delay (a few chunks) is the pipelined analog of the
    reference's keyframe-queue latency (LocalMapping.cc:114-126)."""

    def __init__(self, cfg: SlamConfig, trackers, mesh=None, chunk_size: int = 8):
        self.cfg = cfg
        self.trackers = list(trackers)
        self.mesh = mesh
        self.chunk_size = chunk_size
        if not self.trackers:
            raise ValueError("StreamBank needs at least one tracker")
        self._extract = self.trackers[0].extract
        # the step is built lazily (and rebuilt ONCE when the shared
        # vocabulary appears — the with_bow program folds the BoW database
        # update + loop-candidate scan into the dispatch)
        self._step = None
        self._step_bow = False
        self.bow_all = None  # [R, K, n_words] when with_bow
        # pipelining: the dispatched-but-unfetched chunk (device values)
        self._pending = None
        # stack per-robot device state [R, ...]
        for t in self.trackers:
            if t._ts is None:
                t._ts = t._make_ts()
        self.m_all = stack_trees([t.mapctx.map for t in self.trackers])
        self.ts_all = stack_trees([t._ts for t in self.trackers])
        self.K_all = jnp.stack([t.K for t in self.trackers])
        if mesh is not None:
            self.m_all = shard_streams(self.m_all, mesh)
            self.ts_all = shard_streams(self.ts_all, mesh)
            self.K_all = shard_streams(self.K_all, mesh)
        # trackers' host-side map references go stale while the bank runs;
        # mark them so accidental per-frame stepping is caught
        self._dirty = [False] * len(self.trackers)
        # per-robot generation: bumped by any host-side slice overwrite
        # (merge adoption, shared refresh, stream reset). An in-flight chunk
        # dispatched under an older generation is STALE for that robot.
        self._gens = [0] * len(self.trackers)
        # per-robot pending pose rebase A (np [4,4]): applied to the next
        # finished chunk's record poses after a loop correction moved the
        # map under an in-flight chunk (T_cw' = T_cw @ A)
        self._rebase: dict[int, np.ndarray] = {}
        # follower slot -> owner slot for robots sharing a merged MapContext
        self.followers: dict[int, int] = {}
        # follower slot -> [(record, src_slot, T_rel)] whose reference
        # keyframe is a copy-local slot not yet replayed into the
        # authoritative map; resolved by _replay_follower_kfs
        self._pending_ref: dict[int, list] = {}
        # follower slot -> copy-local keyframe slots awaiting replay into
        # the authoritative map at the next sync point
        self._follower_backlog: dict[int, list[int]] = {}
        # owner slot -> accumulated (T_old, T_new) loop corrections to
        # thread through the followers' TrackStates at the next sync point
        # (the owner itself is rebased immediately, pipelined)
        self._shared_rebase: dict[int, list] = {}
        # sync-point cadence: every N chunks with a non-empty backlog the
        # pipeline drains once and the shared map reconciles
        self.replay_interval = 4
        self._chunks_since_sync = 0
        self._want_sync = False
        # owner slot -> lm_valid snapshot at the last shared refresh
        self._shared_lm_valid: dict[int, jax.Array] = {}
        # follower slot -> authoritative n_kf at its last refresh: only
        # copy slots AT or ABOVE this replay (earlier slots are either the
        # merge transplant itself or already-replayed keyframes)
        self._follower_base_nkf: dict[int, int] = {}
        # optional hook called ONCE when a robot transitions to LOST
        # (wire to MultiMapper._handle_loss for new-map-on-loss semantics)
        self.on_lost = None
        # optional hook called once at the END of every chunk finish —
        # wire to MultiMapper.pump_merge_scans so the deferred cross-map
        # scan pipeline advances exactly once per chunk
        self.on_chunk_end = None

    @property
    def n_streams(self) -> int:
        return len(self.trackers)

    def process_chunk(self, images, timestamps):
        """Advance every stream by one chunk — ALWAYS pipelined.

        images: [R, C, H, W] uint8 (numpy or device), timestamps: [R, C].
        Robots that are not OK are advanced on the HOST per-frame path
        (initialization / loss recovery) and rejoin the bank when OK.
        Chunk k+1 is dispatched before chunk k's summaries are fetched;
        returns the PREVIOUS chunk's per-robot FrameRecord lists ([] on the
        first call, plus any records drained by a sync point). ``flush()``
        / ``sync_to_trackers`` drains the in-flight chunk."""
        from orbslamm_tpu.models.system import TrackingState

        C = len(timestamps[0])
        out = []
        if self._want_sync:
            # sync point: drain the pipeline once and reconcile the shared
            # map (follower backlog replay + member refresh)
            out += self.flush()
            self._do_shared_sync()
        # host catch-up for robots outside the bank (init / post-loss):
        # their bank slice is frozen (latched lost flag), the host path
        # owns their frames until they are OK again
        host_handled = set()
        for r, t in enumerate(self.trackers):
            if t.state != TrackingState.OK:
                host_handled.add(r)
                for j in range(C):
                    t.process_frame(np.asarray(images[r][j]),
                                    float(timestamps[r][j]))
                    if t.state == TrackingState.LOST and self.on_lost is not None:
                        self.on_lost(t)
        tok = self._dispatch(images, timestamps, host_handled)
        if self._pending is not None:
            out += self._finish(self._pending)
        self._pending = tok
        # robots that recovered on the host path rejoin the bank AFTER the
        # dispatch consumed their old frozen slice (their images this chunk
        # were host-processed; re-adopting earlier would double-track them)
        for r in host_handled:
            if self.trackers[r].state == TrackingState.OK:
                self.reset_stream(r)
        return out

    def flush(self):
        """Finish the in-flight chunk (if any) and return its records."""
        if self._pending is None:
            return []
        out = self._finish(self._pending)
        self._pending = None
        return out

    def _want_bow(self) -> bool:
        vocs = [t.mapctx.voc for t in self.trackers]
        return all(v is not None for v in vocs) and all(
            v is vocs[0] for v in vocs
        ) and all(t.mapctx.kf_bow is not None for t in self.trackers)

    def _dispatch(self, images, timestamps, host_handled=frozenset()):
        R, C = len(self.trackers), len(timestamps[0])
        want_bow = self._want_bow()
        if self._step is None or self._step_bow != want_bow:
            # program rebuild mid-run (vocabulary appeared): drain any
            # in-flight chunk first — bow_all is restacked from tracker
            # state, which must not race an unfetched dispatch
            if self._pending is not None:
                self.flush()
            self._step = make_multistream_chunk_step(
                self.cfg, self._extract, with_bow=want_bow
            )
            self._step_bow = want_bow
            self.bow_all = (
                stack_trees([t.mapctx.kf_bow for t in self.trackers])
                if want_bow else None
            )
        imgs = jnp.asarray(images)
        fid0s = []
        for r, t in enumerate(self.trackers):
            if r in host_handled:
                fid0s.append(t.frame_id + 1)  # already advanced by host path
            else:
                fid0s.append(t.frame_id + 1)
                t.frame_id += C
        fids = jnp.stack([
            jnp.arange(f0, f0 + C, dtype=jnp.int32) for f0 in fid0s
        ])
        stamps = jnp.asarray(np.asarray(timestamps, np.float32))
        allow = jnp.asarray(
            [not t.localization_only for t in self.trackers]
        )
        bow_in = self.bow_all if want_bow else jnp.zeros((R,), jnp.float32)
        voc = self.trackers[0].mapctx.voc if want_bow else None
        tr = get_tracer()
        with tr.span("multistream_chunk", n_streams=R, chunk=C):
            self.m_all, self.ts_all, bow_out, summaries, kf_events = (
                self._step(
                    self.m_all, self.ts_all, bow_in, self.K_all, imgs, fids,
                    stamps, allow, voc,
                )
            )
        if want_bow:
            self.bow_all = bow_out
        return {
            "summaries": summaries,
            "kf_events": kf_events,
            "timestamps": np.asarray(timestamps, np.float64),
            "fid0s": fid0s,
            "want_bow": want_bow,
            "gens": list(self._gens),
            "map_ids": [t.mapctx.map_id for t in self.trackers],
            "host_handled": set(host_handled),
        }

    def _finish(self, token):
        """Fetch a dispatched chunk's summaries and run all keyframe-rate
        host events (records, loop closing, merge scans, follower replay,
        GBA slices)."""
        from orbslamm_tpu.models.system import FrameRecord, TrackingState

        timestamps = token["timestamps"]
        want_bow = token["want_bow"]
        R, C = len(self.trackers), timestamps.shape[1]
        tr = get_tracer()
        # pending overlapped-GBA slice costs ride the chunk fetch (computed
        # since the last boundary — the fetch is free; no separate RTT)
        gba_mcs = []
        seen_mc = set()
        for t in self.trackers:
            mc0 = t.mapctx
            if id(mc0) not in seen_mc and mc0._gba_cost_pending is not None:
                seen_mc.add(id(mc0))
                gba_mcs.append(mc0)
        with tr.span("ms_fetch"):
            # ONE host sync, all streams (summaries + deferred kf events)
            s, ev, gba_costs = jax.device_get((
                token["summaries"], token["kf_events"],
                [mc0._gba_cost_pending for mc0 in gba_mcs],
            ))
        for mc0, c in zip(gba_mcs, gba_costs):
            mc0._gba_cost_pending = None
            mc0.gba_resolve_cost(float(c))

        all_recs = []
        kfs_per_robot: list[list[tuple[int, int]]] = []  # (slot, j)
        any_kfs = False
        newly_lost: list[int] = []
        for r, t in enumerate(self.trackers):
            recs = []
            new_kfs = []
            if r in token["host_handled"]:
                # this robot's frames were host-processed (records already
                # appended there); its frozen slice produced no-ops
                kfs_per_robot.append(new_kfs)
                all_recs.append(recs)
                continue
            stale = token["gens"][r] != self._gens[r]
            A = self._rebase.pop(r, None)  # always consume (never leak to a
            if stale:                      # later chunk's records)
                A = None
            mc = t.mapctx
            for j in range(C):
                ok = bool(s.tracking_ok[r, j])
                n_inl = int(s.n_inliers[r, j]) if ok else 0
                T_rec = np.asarray(s.T_cw[r, j]) if ok else np.asarray(t.T_cw)
                if A is not None and ok:
                    # a loop correction landed after this chunk was
                    # dispatched: record poses ride the corrected keyframe
                    T_rec = T_rec @ A
                if ok and not stale:
                    t.T_cw = T_rec
                    if bool(s.new_kf[r, j]):
                        slot = int(s.kf_slot[r, j])
                        if r not in self.followers:
                            mc.n_kf = max(mc.n_kf, slot + 1)
                        new_kfs.append((slot, j))
                        tr.incr("keyframes_inserted")
                elif not ok and not stale:
                    if t.state != TrackingState.LOST:
                        newly_lost.append(r)
                    t.state = TrackingState.LOST
                ref_slot, T_rel, pend_src = -1, None, None
                if ok:
                    ref_slot = int(s.ref_slot[r, j])
                    T_rel = np.asarray(s.T_rel[r, j])
                    if (r in self.followers
                            and ref_slot >= self._follower_base_nkf.get(r, 0)):
                        # reference KF is a copy-local slot: its number means
                        # nothing in the authoritative map until the replay
                        # assigns it a destination slot
                        pend_src, ref_slot, T_rel = ref_slot, -1, None
                rec = FrameRecord(
                    frame_id=token["fid0s"][r] + j,
                    timestamp=float(timestamps[r][j]),
                    T_cw=T_rec,
                    state=("OK" if ok else "LOST") if stale else t.state.name,
                    n_inliers=n_inl,
                    # stale records belong to the map they were dispatched
                    # under (a merge may have moved the robot since)
                    map_id=token["map_ids"][r] if stale else mc.map_id,
                    ref_slot=ref_slot,
                    T_rel=T_rel,
                )
                if pend_src is not None:
                    self._pending_ref.setdefault(r, []).append(
                        (rec, pend_src, np.asarray(s.T_rel[r, j]))
                    )
                t.frames.append(rec)
                recs.append(rec)
            if not stale:
                self._dirty[r] = self._dirty[r] or bool(new_kfs)
                any_kfs = any_kfs or bool(new_kfs)
            else:
                new_kfs = []
            kfs_per_robot.append(new_kfs)
            all_recs.append(recs)

        if any_kfs:
            # refresh EVERY robot's MapContext from its bank slice before any
            # keyframe-rate event runs: a cross-robot merge scan reads OTHER
            # robots' maps, which must not be a chunk stale. Followers are
            # skipped — their mapctx IS the shared context, whose
            # authoritative array is the OWNER's slice
            for r in range(R):
                if self._dirty[r] and r not in self.followers:
                    self._sync_tracker(r)

        for t in self.trackers:
            t._in_chunk_finish = True

        def any_map_switched():
            return any(
                self.trackers[q].mapctx.map_id != token["map_ids"][q]
                for q in range(R)
            )

        for r, t in enumerate(self.trackers):
            new_kfs = kfs_per_robot[r]
            if not new_kfs:
                continue
            if r in self.followers:
                continue  # reconciled below; owner's context runs loop events
            if t.mapctx.map_id != token["map_ids"][r]:
                continue  # merged away mid-finish; reconciled below
            mc = t.mapctx
            # keyframe-rate host events on this robot's slice
            if mc.voc is None and t.on_keyframe is None:
                continue
            with tr.span("ms_kf_events"):
                if want_bow:
                    # BoW rows + candidate scores computed INSIDE the chunk
                    # (phase B of the deferred body), keyed by keyframe slot
                    pre = {
                        int(ev.slot[r, e]): (np.asarray(ev.loop_scores[r, e]),
                                             float(ev.loop_min_score[r, e]))
                        for e in range(ev.j.shape[1])
                        if ev.j[r, e] >= 0
                    }
                else:
                    mc.update_bow_rows([slot for slot, _ in new_kfs])
                    pre = mc.loop_scan([slot for slot, _ in new_kfs])
                corrections = []
                merged = False
                for slot, _j in new_kfs:
                    t._key, sub = jax.random.split(t._key)
                    pose_before = mc.map.kf_pose[slot]  # device ref
                    if mc.try_close_loop(slot, sub, precomputed=pre.get(slot)):
                        corrections.append((np.asarray(pose_before),
                                            np.asarray(mc.map.kf_pose[slot])))
                    if t.on_keyframe is not None:
                        t.on_keyframe(t, slot)
                        if any_map_switched():
                            # a merge fired — EITHER side may be this robot:
                            # absorbing keeps its mapctx (content replaced),
                            # absorbed robots switch contexts. Stop event
                            # processing; reconciliation below pairs and
                            # refreshes every affected slice.
                            merged = True
                            break
                if not merged and corrections:
                    self._apply_loop_corrections(r, corrections)

        # the deferred scan pipeline pumps ONCE per chunk — merges fire HERE
        # (before reconciliation: the blocks below pair/refresh the slices
        # of whichever robots a merge just moved or mutated)
        for t in self.trackers:
            t._in_chunk_finish = False
        if self.on_chunk_end is not None:
            with tr.span("ms_pump_scans"):
                self.on_chunk_end()
        # merge reconciliation: every robot whose ACTIVE map changed during
        # this finish (the absorbed side of a cross-robot merge — the
        # absorbing owner's slice is refreshed by the pairing's
        # _refresh_shared) adopts its new context into the bank. Robots on
        # the host path (init / loss recovery) are NOT adopted here — their
        # map switches come from loss handling, and process_chunk re-adopts
        # them through reset_stream once they are OK again.
        for r, t in enumerate(self.trackers):
            if r in self.followers or r in token["host_handled"]:
                continue
            if t.state != TrackingState.OK:
                continue
            if t.mapctx.map_id != token["map_ids"][r]:
                self._adopt_merge(r)
        # orphan-map merges (an absorbed map no bank robot was tracking —
        # e.g. a kept map from an earlier loss): the absorbing robot's
        # mapctx keeps its id but its map array was transplanted and moved —
        # refresh its slice and rebase its tracking state
        for r, t in enumerate(self.trackers):
            reb = t.mapctx.last_merge_rebase
            if reb is None:
                continue
            t.mapctx.last_merge_rebase = None
            if r in self.followers:
                continue
            if any(ow == r for ow in self.followers.values()):
                self._refresh_shared(r, rebase=[reb])
            else:
                self._apply_loop_corrections(r, [reb], refresh_bow=True)
                # the transplant claimed keyframe slots an in-flight chunk
                # may also be writing — discard that chunk for this robot
                self._gens[r] += 1
        # follower keyframes accumulate in a backlog; a sync point every
        # replay_interval chunks drains the pipeline once and replays them
        # into the authoritative map (pipelining is never broken per-chunk)
        any_backlog = False
        for r, o in list(self.followers.items()):
            slots = [s_ for s_, _j in kfs_per_robot[r]
                     if s_ >= self._follower_base_nkf.get(r, 0)]
            if slots:
                bl = self._follower_backlog.setdefault(r, [])
                bl.extend(s_ for s_ in slots if s_ not in bl)
            if self._follower_backlog.get(r):
                any_backlog = True
        self._chunks_since_sync += 1
        if (any_backlog or self._shared_rebase) and (
            self._chunks_since_sync >= self.replay_interval
        ):
            self._want_sync = True
        # overlapped global BA: one async slice per scheduled map per chunk,
        # rewriting the robot's CURRENT slice (the in-flight chunk's output
        # lineage) — no flush, no discard, cost resolved next boundary
        for r, t in enumerate(self.trackers):
            if r in self.followers:
                continue  # the owner runs the shared map's slices
            mc = t.mapctx
            if mc.gba_remaining > 0:
                with tr.span("ms_gba_slice"):
                    self._sync_tracker(r)
                    if mc.gba_slice():
                        self.m_all = tree_set(self.m_all, r, mc.map)
        # loss hooks AFTER all state is consistent (the hook may switch maps)
        if self.on_lost is not None:
            for r in newly_lost:
                t = self.trackers[r]
                if t.state == TrackingState.LOST:
                    if r in self.followers:
                        self.followers.pop(r, None)
                        self._follower_base_nkf.pop(r, None)
                        self._pending_ref.pop(r, None)
                    elif r in set(self.followers.values()):
                        self._promote_follower_owner(r)
                    self.on_lost(t)
        return all_recs

    def _apply_loop_corrections(self, r: int, corrections,
                                refresh_bow: bool = False):
        """A same-map loop correction landed on robot ``r``'s map during
        this finish. The corrected map replaces the bank slice; the device
        TrackState (and, in pipelined mode, the in-flight chunk's pending
        record poses) are REBASED through the corrected keyframe —
        rebuild-from-scratch would discard the slice's tracking context."""
        t = self.trackers[r]
        mc = t.mapctx
        if any(ow == r for ow in self.followers.values()):
            # owner of a shared map: the owner is rebased NOW (pipelined,
            # below); the followers' copies stay in the pre-correction
            # world until the next sync point, where _refresh_shared
            # threads the accumulated corrections through their states
            self._shared_rebase.setdefault(r, []).extend(
                [(np.asarray(a), np.asarray(b)) for a, b in corrections]
            )
            self._want_sync = True
        ts_r = tree_slice(self.ts_all, r)
        A = np.eye(4)
        for T_old, T_new in corrections:
            ts_r = fused.rebase_track_state(
                ts_r, jnp.asarray(T_old), jnp.asarray(T_new)
            )
            A = A @ np.linalg.inv(T_old) @ T_new
        # correct_loop fused landmarks → the carried indicator is stale
        # the map gained keyframes / landmarks (n_kf may have grown by a
        # transplant) — refresh the counters alongside the indicator
        n_kf_new = max(mc.n_kf, int(ts_r.n_kf))
        ts_r = ts_r._replace(obs_ind=ms.lm_indicator(mc.map),
                             n_kf=jnp.int32(n_kf_new),
                             last_kf_T=mc.map.kf_pose[n_kf_new - 1])
        self.ts_all = tree_set(self.ts_all, r, ts_r)
        self.m_all = tree_set(self.m_all, r, mc.map)
        if refresh_bow and self.bow_all is not None and mc.kf_bow is not None:
            self.bow_all = self.bow_all.at[r].set(mc.kf_bow)
        t.T_cw = np.asarray(np.asarray(t.T_cw) @ A)
        t.last_T = jnp.asarray(t.T_cw)
        if self._pending is not None:
            self._rebase[r] = self._rebase.get(r, np.eye(4)) @ A

    def _promote_follower_owner(self, o: int):
        """Owner ``o`` is leaving the shared map (loss): hand the
        authoritative role to its first follower."""
        members = [r for r, ow in self.followers.items() if ow == o]
        if not members:
            return
        # materialize the authoritative map from the owner's slice first
        self._sync_tracker(o)
        new_o = members[0]
        self.followers.pop(new_o)
        self._follower_base_nkf.pop(new_o, None)
        # the new owner's COPY is replaced by the authoritative map: its
        # un-replayed copy-local keyframes and record references die
        if self._follower_backlog.pop(new_o, None):
            get_tracer().event("bank_backlog_dropped", follower=new_o,
                               owner=o)
        self._pending_ref.pop(new_o, None)
        self._shared_rebase.pop(o, None)
        for r in members[1:]:
            self.followers[r] = new_o
        if o in self._shared_lm_valid:
            self._shared_lm_valid[new_o] = self._shared_lm_valid.pop(o)
        mc = self.trackers[o].mapctx
        self.m_all = tree_set(self.m_all, new_o, mc.map)
        # rebuild the new owner's TrackState against the adopted map (its
        # old copy's slot frontier / indicator / associations are invalid)
        t = self.trackers[new_o]
        ts_n = tree_slice(self.ts_all, new_o)
        base_valid = self._shared_lm_valid.get(new_o)
        last_lm = ts_n.last_lm
        if base_valid is not None:
            safe = jnp.maximum(last_lm, 0)
            keep = (last_lm >= 0) & base_valid[safe] & mc.map.lm_valid[safe]
            last_lm = jnp.where(keep, last_lm, -1)
        ts_n = ts_n._replace(
            n_kf=jnp.int32(mc.n_kf),
            obs_ind=ms.lm_indicator(mc.map),
            last_lm=last_lm,
            prev_inliers=jnp.zeros_like(ts_n.prev_inliers),
            last_kf_T=mc.map.kf_pose[jnp.maximum(jnp.int32(mc.n_kf) - 1, 0)],
        )
        self.ts_all = tree_set(self.ts_all, new_o, ts_n)
        self._gens[new_o] += 1
        get_tracer().event("bank_owner_promoted", old_owner=o,
                           new_owner=new_o, map_id=mc.map_id)

    # -- cross-robot merge support ----------------------------------------
    def _adopt_merge(self, r: int):
        """Robot ``r`` was merged into another MapContext mid-chunk. If the
        absorbing context belongs to another bank robot, establish the
        owner/follower pairing and refresh both slices from the merged map;
        otherwise just rebase robot ``r``'s slice."""
        t = self.trackers[r]
        owner = None
        for o, to in enumerate(self.trackers):
            if o != r and to.mapctx is t.mapctx:
                owner = self.followers.get(o, o)  # resolve chains
                break
        if t._ts is None:
            t._ts = t._make_ts()
        if owner is None:
            self.m_all = tree_set(self.m_all, r, t.mapctx.map)
            self.ts_all = tree_set(self.ts_all, r, t._ts)
            self._gens[r] += 1
            return
        self.followers[r] = owner
        get_tracer().event("bank_follower", follower=r, owner=owner,
                           map_id=t.mapctx.map_id)
        # the merge's essential-graph + GBA moved the shared map: thread the
        # anchor-pose correction through the owner's (and any existing
        # follower's) device TrackState
        reb = t.mapctx.last_merge_rebase
        t.mapctx.last_merge_rebase = None
        self._refresh_shared(owner, fresh={r},
                             rebase=[reb] if reb is not None else None)

    def _refresh_shared(self, o: int, fresh: set[int] = frozenset(),
                        rebase=None, rebase_skip: set[int] = frozenset()):
        """Write the authoritative merged map into the owner's and every
        follower's slice; rebuild their TrackStates against it.

        Members not in ``fresh`` take their TrackState from the bank (the
        freshest device copy); ``fresh`` members keep their just-rebuilt
        host state (a newly adopted follower's Sim3-rebased pose).
        ``rebase``: list of (T_kf_old, T_kf_new) corrections to thread
        through every member's TrackState except ``rebase_skip`` members
        (a loop correction moved the shared map under the cameras; the
        owner may have been rebased already at correction time)."""
        mc = self.trackers[o].mapctx
        ind = ms.lm_indicator(mc.map)
        members = [o] + [r for r, ow in self.followers.items() if ow == o]
        base_valid = self._shared_lm_valid.get(o)
        for r in members:
            t = self.trackers[r]
            # copy-local keyframes die with the copy: un-replayed backlog
            # and unresolved record references stay frozen
            if r != o:
                if self._follower_backlog.pop(r, None):
                    get_tracer().event("bank_backlog_dropped", follower=r,
                                       owner=o)
                self._pending_ref.pop(r, None)
            if r not in fresh:
                t._ts = tree_slice(self.ts_all, r)
                if rebase and r not in rebase_skip:
                    for T_old, T_new in rebase:
                        t._ts = fused.rebase_track_state(
                            t._ts, jnp.asarray(T_old), jnp.asarray(T_new)
                        )
                    t.T_cw = np.asarray(t._ts.T_cw)
            if t._ts is None:
                t._ts = t._make_ts()
            last_lm = t._ts.last_lm
            prev_inl = t._ts.prev_inliers
            if r != o and r not in fresh and base_valid is not None:
                # landmark ids a follower created in its chunk-epoch copy
                # mean something else in the authoritative pool (both copies
                # allocate from the same free slots) — keep only
                # associations to landmarks that existed at the last refresh
                safe = jnp.maximum(last_lm, 0)
                keep = (last_lm >= 0) & base_valid[safe] & mc.map.lm_valid[safe]
                last_lm = jnp.where(keep, last_lm, -1)
            # disarm the sudden-collapse gate for the first post-refresh
            # frame — for EVERY member: the merge's essential-graph
            # correction + GBA slices move the shared map under the owner
            # too, and re-locking legitimately starts with fewer inliers
            # than the pre-merge streak
            prev_inl = jnp.zeros_like(prev_inl)
            t._ts = t._ts._replace(
                n_kf=jnp.int32(mc.n_kf),
                obs_ind=ind,
                last_lm=last_lm,
                prev_inliers=prev_inl,
                # the member re-references the shared map's newest keyframe
                last_kf_T=mc.map.kf_pose[jnp.maximum(jnp.int32(mc.n_kf) - 1, 0)],
            )
            t.mapctx = mc
            self._dirty[r] = False
            self._gens[r] += 1
        # batched slice writes: one dispatch for the shared map (broadcast
        # into every member's row), one for the stacked TrackStates
        idxs = jnp.asarray(members, jnp.int32)
        self.m_all = _set_slices_broadcast(self.m_all, idxs, mc.map)
        self.ts_all = _set_slices_stacked(
            self.ts_all, idxs,
            stack_trees([self.trackers[r]._ts for r in members]),
        )
        if self.bow_all is not None and mc.kf_bow is not None:
            self.bow_all = self.bow_all.at[idxs].set(mc.kf_bow[None])
        # snapshot of the authoritative pool's occupancy for the next
        # reconciliation's association filter, and the keyframe high-water
        # mark below which follower copy slots must never be replayed
        self._shared_lm_valid[o] = mc.map.lm_valid
        for r in members:
            if r != o:
                self._follower_base_nkf[r] = mc.n_kf

    def _replay_follower_kfs(self, r: int, o: int, slots: list[int]):
        """Replay the follower's backlog of copy-local keyframes into the
        authoritative map in ONE jitted dispatch per 16 keyframes
        (_replay_kfs_device), preserving only associations to landmarks
        that exist in the authoritative pool AND existed at the last shared
        refresh (later ids alias follower-copy allocations — both copies
        draw from the same free slots). Sync-point only: the pipeline is
        drained, so mc.n_kf is the true slot frontier."""
        mc = self.trackers[o].mapctx
        tr = get_tracer()
        cap = self.cfg.capacity.max_keyframes - 1
        n_allowed = max(0, min(len(slots), cap - mc.n_kf))
        for s_ in slots[n_allowed:]:
            tr.event("bank_replay_skipped_capacity", follower=r,
                     slot=int(s_), n_kf=mc.n_kf)
        remap: dict[int, int] = {}  # copy slot -> authoritative slot
        if n_allowed > 0:
            mB = tree_slice(self.m_all, r)  # follower's evolved copy
            base_valid = self._shared_lm_valid.get(o)
            if base_valid is None:
                base_valid = mc.map.lm_valid
            want_bow = mc.kf_bow is not None and mc.voc is not None
            P = 16
            take = slots[:n_allowed]
            for g0 in range(0, len(take), P):
                grp = take[g0 : g0 + P]
                src = jnp.asarray((grp + [-1] * P)[:P], jnp.int32)
                bow_in = mc.kf_bow if want_bow else jnp.zeros((), jnp.float32)
                mA2, bow2 = _replay_kfs_device(
                    self.cfg, mc.map, bow_in, mc.voc if want_bow else None,
                    mB, src, base_valid, jnp.int32(mc.n_kf),
                    jnp.int32(len(grp)), want_bow,
                )
                mc.map = mA2
                if want_bow:
                    mc.kf_bow = bow2
                for i, s_ in enumerate(grp):
                    remap[int(s_)] = mc.n_kf + i
                    tr.event("bank_replay_kf", follower=r, owner=o,
                             src_slot=int(s_), dst_slot=mc.n_kf + i)
                mc.n_kf += len(grp)
        # re-point records whose reference KF was a copy-local slot at its
        # authoritative destination (capacity-skipped slots stay frozen)
        pend = self._pending_ref.pop(r, [])
        rest = []
        for rec, src, T_rel in pend:
            dst = remap.get(src)
            if dst is not None:
                rec.ref_slot = dst
                rec.T_rel = T_rel
            elif src not in [int(x) for x in slots]:
                rest.append((rec, src, T_rel))  # not in this round's batch
        if rest:
            self._pending_ref[r] = rest

    def _do_shared_sync(self):
        """Sync point (pipeline already drained by process_chunk): replay
        every follower's backlog into the authoritative map, then refresh
        every member's slice/TrackState from it, threading any accumulated
        owner-side loop corrections through the followers."""
        tr = get_tracer()
        self._want_sync = False
        self._chunks_since_sync = 0
        owners = set(self.followers.values()) | set(self._shared_rebase)
        for o in owners:
            if o in self.followers:
                continue  # stale entry (owner was demoted/lost)
            self._sync_tracker(o)
            with tr.span("ms_follower_replay"):
                for r, ow in list(self.followers.items()):
                    if ow != o:
                        continue
                    slots = self._follower_backlog.pop(r, [])
                    if slots:
                        self._replay_follower_kfs(r, o, slots)
            reb = self._shared_rebase.pop(o, None)
            with tr.span("ms_refresh_shared"):
                # the owner was rebased at correction time — only the
                # followers need the accumulated corrections threaded in
                self._refresh_shared(o, rebase=reb, rebase_skip={o})

    def reset_stream(self, r: int):
        """Adopt tracker ``r``'s CURRENT host state into the bank — call
        after the owner handled a loss (new map / reset / relocalization)
        or a merge changed the robot's active map."""
        t = self.trackers[r]
        self.followers.pop(r, None)
        self._follower_base_nkf.pop(r, None)
        self._pending_ref.pop(r, None)  # unresolved refs stay frozen
        self._follower_backlog.pop(r, None)
        self._shared_rebase.pop(r, None)
        if t._ts is None:
            t._ts = t._make_ts()
        self.m_all = tree_set(self.m_all, r, t.mapctx.map)
        self.ts_all = tree_set(self.ts_all, r, t._ts)
        if self.bow_all is not None and t.mapctx.kf_bow is not None:
            self.bow_all = self.bow_all.at[r].set(t.mapctx.kf_bow)
        self._dirty[r] = False
        self._gens[r] += 1

    def _sync_tracker(self, r: int):
        """Materialize robot ``r``'s map slice into its MapContext.

        A follower's chunk-epoch COPY must never overwrite the shared
        context's authoritative array (the owner's slice) — only its
        tracking state is synced."""
        t = self.trackers[r]
        if r not in self.followers:
            t.mapctx.map = tree_slice(self.m_all, r)
            if self.bow_all is not None:
                t.mapctx.kf_bow = self.bow_all[r]
        t._ts = tree_slice(self.ts_all, r)
        self._dirty[r] = False

    def sync_to_trackers(self):
        """Drain the in-flight chunk, reconcile any outstanding shared-map
        backlog, and write all device state back into the trackers (for
        trajectory export, merging, serialization)."""
        from orbslamm_tpu.models.system import TrackingState

        self.flush()
        if self._follower_backlog or self._shared_rebase or self._want_sync:
            self._do_shared_sync()
        for r in range(len(self.trackers)):
            if self.trackers[r].state == TrackingState.OK:
                self._sync_tracker(r)
                self.trackers[r]._sync_from_ts()
