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

Pipelining and epoch safety: chunk k+1 is dispatched before chunk k's
summaries are fetched (device never idles), EXCEPT while any owner/follower
pairing is active or a global-BA slice schedule is pending — those phases
refresh bank slices at every chunk boundary, and refreshing under an
in-flight chunk discards its results. In the pipelined phase, rare host
events are reconciled explicitly:

  * same-map loop corrections REBASE the in-flight chunk (device state and
    its pending record poses ride the corrected keyframe — the reference's
    Tcr reference-chain trick, System.cc:470-499);
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
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models.fused import FrameSummary, TrackState
from orbslamm_tpu.utils.config import SlamConfig
from orbslamm_tpu.utils.trace import get_tracer


def make_multistream_chunk_step(cfg: SlamConfig, extract_fn,
                                with_bow: bool = False, kmax: int = 3):
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
    the follower tracks (and keeps inserting keyframes) in a chunk-epoch
    COPY, and at every chunk boundary its new keyframes are REPLAYED into
    the authoritative map through the host insert pipeline, after which
    both slices are refreshed from the authoritative state. Both robots
    therefore keep tracking AND contributing keyframes to the one shared
    map, with reconciliation at chunk granularity (the same delay the
    reference's keyframe queues introduce). While pairings are active the
    bank runs chunks synchronously (no in-flight chunk across a refresh)."""

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

    def _needs_sync_mode(self) -> bool:
        """True while chunk boundaries mutate bank slices (follower replay /
        shared refresh / GBA slices) — an in-flight chunk would be
        discarded by those writes, so the bank runs unpipelined."""
        if self.followers:
            return True
        return any(t.mapctx.gba_remaining > 0 for t in self.trackers)

    def process_chunk(self, images, timestamps):
        """Advance every stream by one chunk.

        images: [R, C, H, W] uint8 (numpy or device), timestamps: [R, C].
        Robots that are not OK are advanced on the HOST per-frame path
        (initialization / loss recovery) and rejoin the bank when OK.
        Pipelined phase: chunk k+1 is dispatched before chunk k's summaries
        are fetched; returns the PREVIOUS chunk's per-robot FrameRecord
        lists ([] on the first call). Synchronous phase (active pairings /
        pending GBA): returns the records available after this chunk.
        ``flush()`` / ``sync_to_trackers`` drains any in-flight chunk."""
        from orbslamm_tpu.models.system import TrackingState

        C = len(timestamps[0])
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
        if self._needs_sync_mode():
            out = self.flush()
            tok = self._dispatch(images, timestamps, host_handled)
            out += self._finish(tok)
        else:
            tok = self._dispatch(images, timestamps, host_handled)
            out = []
            if self._pending is not None:
                out = self._finish(self._pending)
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
        with tr.span("ms_fetch"):
            # ONE host sync, all streams (summaries + deferred kf events)
            s, ev = jax.device_get((token["summaries"], token["kf_events"]))

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
                rec = FrameRecord(
                    frame_id=token["fid0s"][r] + j,
                    timestamp=float(timestamps[r][j]),
                    T_cw=T_rec,
                    state=("OK" if ok else "LOST") if stale else t.state.name,
                    n_inliers=n_inl,
                    # stale records belong to the map they were dispatched
                    # under (a merge may have moved the robot since)
                    map_id=token["map_ids"][r] if stale else mc.map_id,
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
        # _refresh_shared) adopts its new context into the bank
        for r, t in enumerate(self.trackers):
            if r in self.followers:
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
        # chunk-epoch reconciliation of established followers
        for r, o in list(self.followers.items()):
            slots = [s_ for s_, _j in kfs_per_robot[r]
                     if s_ >= self._follower_base_nkf.get(r, 0)]
            if slots:
                with tr.span("ms_follower_replay"):
                    self._replay_follower_kfs(r, o, slots)
                with tr.span("ms_refresh_shared"):
                    self._refresh_shared(o)
        # overlapped global BA: one slice per scheduled map per chunk
        for r, t in enumerate(self.trackers):
            if r in self.followers:
                continue  # the owner runs the shared map's slices
            mc = t.mapctx
            if mc.gba_remaining > 0:
                with tr.span("ms_gba_slice"):
                    if self._dirty[r]:
                        self._sync_tracker(r)
                    if mc.gba_slice():
                        if any(ow == r for ow in self.followers.values()):
                            self._refresh_shared(r)
                        else:
                            self.m_all = tree_set(self.m_all, r, mc.map)
        # loss hooks AFTER all state is consistent (the hook may switch maps)
        if self.on_lost is not None:
            for r in newly_lost:
                t = self.trackers[r]
                if t.state == TrackingState.LOST:
                    if r in self.followers:
                        self.followers.pop(r, None)
                        self._follower_base_nkf.pop(r, None)
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
            # owner of a shared map: full refresh propagates the corrected
            # state to every member (sync mode — nothing in flight)
            self._refresh_shared(r, rebase=corrections)
            return
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
        ts_r = ts_r._replace(obs_ind=ms.lm_indicator(mc.map),
                             n_kf=jnp.int32(max(mc.n_kf, int(ts_r.n_kf))))
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
        for r in members[1:]:
            self.followers[r] = new_o
        if o in self._shared_lm_valid:
            self._shared_lm_valid[new_o] = self._shared_lm_valid.pop(o)
        mc = self.trackers[o].mapctx
        self.m_all = tree_set(self.m_all, new_o, mc.map)
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
                        rebase=None):
        """Write the authoritative merged map into the owner's and every
        follower's slice; rebuild their TrackStates against it.

        Members not in ``fresh`` take their TrackState from the bank (the
        freshest device copy); ``fresh`` members keep their just-rebuilt
        host state (a newly adopted follower's Sim3-rebased pose).
        ``rebase``: list of (T_kf_old, T_kf_new) corrections to thread
        through every member's TrackState (a loop correction moved the
        shared map under the cameras)."""
        mc = self.trackers[o].mapctx
        ind = ms.lm_indicator(mc.map)
        members = [o] + [r for r, ow in self.followers.items() if ow == o]
        base_valid = self._shared_lm_valid.get(o)
        for r in members:
            t = self.trackers[r]
            if r not in fresh:
                t._ts = tree_slice(self.ts_all, r)
                if rebase:
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
        """Replay keyframes a follower inserted into its chunk-epoch copy
        into the authoritative map (host insert pipeline), preserving only
        associations to landmarks that exist in the authoritative pool AND
        existed at the last shared refresh (later ids alias follower-copy
        allocations — both copies draw from the same free slots)."""
        from orbslamm_tpu.ops.orb import Features

        mB = tree_slice(self.m_all, r)  # follower's evolved copy
        mc = self.trackers[o].mapctx
        base_valid = self._shared_lm_valid.get(o)
        tr = get_tracer()
        for s_ in slots:
            if mc.n_kf >= self.cfg.capacity.max_keyframes - 1:
                tr.event("bank_replay_skipped_capacity", follower=r,
                         slot=int(s_), n_kf=mc.n_kf)
                break
            sl = jnp.int32(s_)
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
            keep = (obs >= 0) & mc.map.lm_valid[safe]
            if base_valid is not None:
                keep &= base_valid[safe]
            obs_clean = jnp.where(keep, obs, -1)
            new_slot = mc.insert_keyframe(
                mB.kf_pose[sl], mB.kf_K[sl], feats, obs_clean,
                mB.kf_frame_id[sl], mB.kf_timestamp[sl], light=True,
            )
            mc.update_bow_row(new_slot)
            tr.event("bank_replay_kf", follower=r, owner=o,
                     src_slot=int(s_), dst_slot=new_slot)

    def reset_stream(self, r: int):
        """Adopt tracker ``r``'s CURRENT host state into the bank — call
        after the owner handled a loss (new map / reset / relocalization)
        or a merge changed the robot's active map."""
        t = self.trackers[r]
        self.followers.pop(r, None)
        self._follower_base_nkf.pop(r, None)
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
        """Drain the in-flight chunk and write all device state back into
        the trackers (for trajectory export, merging, serialization)."""
        from orbslamm_tpu.models.system import TrackingState

        self.flush()
        for r in range(len(self.trackers)):
            if self.trackers[r].state == TrackingState.OK:
                self._sync_tracker(r)
                self.trackers[r]._sync_from_ts()
