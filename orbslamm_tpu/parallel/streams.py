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
                                with_bow: bool = False):
    """jit(vmap(chunk)) over a leading robot axis.

    Returns step(m[R,...], ts[R,...], kf_bow[R,K,W], K[R,3,3],
    images[R,C,H,W], frame_ids[R,C], timestamps[R,C], allow_kf[R], voc) ->
    (m, ts, kf_bow, summaries[R,C]). With ``with_bow`` the per-keyframe BoW
    database update + loop-candidate scan ride inside the program (the
    shared vocabulary broadcasts across the robot axis); without it,
    ``kf_bow`` is an [R] dummy passed through."""
    body = fused._make_frame_body(cfg, extract_fn, with_bow=with_bow)

    def one_robot(m, ts, kf_bow, K, images, frame_ids, timestamps, allow_kf,
                  voc):
        return fused._chunk_body(
            body, extract_fn, m, ts, kf_bow, voc,
            images, frame_ids, timestamps, K, allow_kf,
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
    reference's keyframe queues introduce)."""

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
        # follower slot -> owner slot for robots sharing a merged MapContext
        self.followers: dict[int, int] = {}
        # owner slot -> lm_valid snapshot at the last shared refresh
        self._shared_lm_valid: dict[int, jax.Array] = {}
        # follower slot -> authoritative n_kf at its last refresh: only
        # copy slots AT or ABOVE this replay (earlier slots are either the
        # merge transplant itself or already-replayed keyframes)
        self._follower_base_nkf: dict[int, int] = {}

    @property
    def n_streams(self) -> int:
        return len(self.trackers)

    def process_chunk(self, images, timestamps):
        """Advance every stream by one chunk in ONE PIPELINED dispatch.

        images: [R, C, H, W] uint8 (numpy or device), timestamps: [R, C].
        Chunk k+1 is dispatched before chunk k's summaries are fetched, so
        host work and transfers overlap device compute (the single-stream
        path's double-buffering). Returns the PREVIOUS chunk's per-robot
        FrameRecord lists ([] on the first call); ``flush()`` /
        ``sync_to_trackers`` drains the in-flight chunk."""
        tok = self._dispatch(images, timestamps)
        out = []
        if self._pending is not None:
            out = self._finish(self._pending)
        self._pending = tok
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

    def _dispatch(self, images, timestamps):
        R, C = len(self.trackers), len(timestamps[0])
        want_bow = self._want_bow()
        if self._step is None or self._step_bow != want_bow:
            self._step = make_multistream_chunk_step(
                self.cfg, self._extract, with_bow=want_bow
            )
            self._step_bow = want_bow
            self.bow_all = (
                stack_trees([t.mapctx.kf_bow for t in self.trackers])
                if want_bow else None
            )
        imgs = jnp.asarray(images)
        fid0s = [t.frame_id + 1 for t in self.trackers]
        fids = jnp.stack([
            jnp.arange(f0, f0 + C, dtype=jnp.int32) for f0 in fid0s
        ])
        for t in self.trackers:
            t.frame_id += C
        stamps = jnp.asarray(np.asarray(timestamps, np.float32))
        allow = jnp.asarray(
            [not t.localization_only for t in self.trackers]
        )
        bow_in = self.bow_all if want_bow else jnp.zeros((R,), jnp.float32)
        voc = self.trackers[0].mapctx.voc if want_bow else None
        tr = get_tracer()
        with tr.span("multistream_chunk", n_streams=R, chunk=C):
            self.m_all, self.ts_all, bow_out, summaries = self._step(
                self.m_all, self.ts_all, bow_in, self.K_all, imgs, fids,
                stamps, allow, voc,
            )
        if want_bow:
            self.bow_all = bow_out
        return {
            "summaries": summaries,
            "timestamps": np.asarray(timestamps, np.float64),
            "fid0s": fid0s,
            "want_bow": want_bow,
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
        s = jax.device_get(token["summaries"])  # ONE host sync, all streams

        all_recs = []
        kfs_per_robot: list[list[tuple[int, int]]] = []  # (slot, j)
        any_kfs = False
        for r, t in enumerate(self.trackers):
            mc = t.mapctx
            recs = []
            new_kfs = []
            for j in range(C):
                ok = bool(s.tracking_ok[r, j])
                n_inl = int(s.n_inliers[r, j]) if ok else 0
                if ok:
                    t.T_cw = np.asarray(s.T_cw[r, j])
                    if bool(s.new_kf[r, j]):
                        slot = int(s.kf_slot[r, j])
                        if r not in self.followers:
                            mc.n_kf = max(mc.n_kf, slot + 1)
                        new_kfs.append((slot, j))
                        tr.incr("keyframes_inserted")
                else:
                    t.state = TrackingState.LOST
                rec = FrameRecord(
                    frame_id=token["fid0s"][r] + j,
                    timestamp=float(timestamps[r][j]),
                    T_cw=np.asarray(t.T_cw),
                    state=t.state.name,
                    n_inliers=n_inl,
                    map_id=mc.map_id,
                )
                t.frames.append(rec)
                recs.append(rec)
            self._dirty[r] = self._dirty[r] or bool(new_kfs)
            kfs_per_robot.append(new_kfs)
            any_kfs = any_kfs or bool(new_kfs)
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

        for r, t in enumerate(self.trackers):
            new_kfs = kfs_per_robot[r]
            if not new_kfs:
                continue
            if r in self.followers:
                continue  # reconciled below; owner's context runs loop events
            mc = t.mapctx
            # keyframe-rate host events on this robot's slice
            if mc.voc is not None or t.on_keyframe is not None:
                if want_bow:
                    # BoW rows + candidate scores computed INSIDE the chunk
                    pre = {
                        slot: (np.asarray(s.loop_scores[r, j]),
                               float(s.loop_min_score[r, j]))
                        for slot, j in new_kfs
                    }
                else:
                    mc.update_bow_rows([slot for slot, _ in new_kfs])
                    pre = mc.loop_scan([slot for slot, _ in new_kfs])
                changed = False
                for slot, _j in new_kfs:
                    t._key, sub = jax.random.split(t._key)
                    if mc.try_close_loop(slot, sub, precomputed=pre.get(slot)):
                        # loop correction moved the map: restart the motion
                        # model at the corrected keyframe (single-stream
                        # _track_fused does the same)
                        changed = True
                        t._sync_from_ts()
                        t.T_cw = t.mapctx.map.kf_pose[slot]
                        t.last_T = t.T_cw
                        t.velocity = jnp.eye(4)
                    if t.on_keyframe is not None:
                        t.on_keyframe(t, slot)
                        if t.mapctx is not mc:
                            changed = True  # merged into another map
                            break
                if changed and t.mapctx is not mc:
                    self._adopt_merge(r)
                elif changed and r in [ow for ow in self.followers.values()]:
                    # a loop correction moved the shared map: propagate the
                    # corrected authoritative state to every follower slice
                    self._refresh_shared(r)
                elif changed:
                    # write the corrected map back into the stacked state
                    self.m_all = tree_set(self.m_all, r, t.mapctx.map)
                    self.ts_all = tree_set(
                        self.ts_all, r,
                        t._make_ts() if t._ts is None else t._ts,
                    )
        # chunk-epoch reconciliation of established followers
        for r, o in list(self.followers.items()):
            slots = [s_ for s_, _j in kfs_per_robot[r]
                     if s_ >= self._follower_base_nkf.get(r, 0)]
            if slots:
                self._replay_follower_kfs(r, o, slots)
                self._refresh_shared(o)
        # overlapped global BA: one slice per scheduled map per chunk
        for r, t in enumerate(self.trackers):
            if r in self.followers:
                continue  # the owner runs the shared map's slices
            mc = t.mapctx
            if mc.gba_remaining > 0:
                if self._dirty[r]:
                    self._sync_tracker(r)
                if mc.gba_slice():
                    if any(ow == r for ow in self.followers.values()):
                        self._refresh_shared(r)
                    else:
                        self.m_all = tree_set(self.m_all, r, mc.map)
        return all_recs

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
            return
        self.followers[r] = owner
        get_tracer().event("bank_follower", follower=r, owner=owner,
                           map_id=t.mapctx.map_id)
        self._refresh_shared(owner, fresh={r})

    def _refresh_shared(self, o: int, fresh: set[int] = frozenset()):
        """Write the authoritative merged map into the owner's and every
        follower's slice; rebuild their TrackStates against it.

        Members not in ``fresh`` take their TrackState from the bank (the
        freshest device copy); ``fresh`` members keep their just-rebuilt
        host state (a newly adopted follower's Sim3-rebased pose)."""
        mc = self.trackers[o].mapctx
        ind = ms.lm_indicator(mc.map)
        members = [o] + [r for r, ow in self.followers.items() if ow == o]
        base_valid = self._shared_lm_valid.get(o)
        for r in members:
            t = self.trackers[r]
            if r not in fresh:
                t._ts = tree_slice(self.ts_all, r)
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
            if r != o:
                # disarm the sudden-collapse gate for the first post-refresh
                # frame: re-locking in the shared map legitimately starts
                # with fewer inliers than the pre-merge streak
                prev_inl = jnp.zeros_like(prev_inl)
            t._ts = t._ts._replace(
                n_kf=jnp.int32(mc.n_kf),
                obs_ind=ind,
                last_lm=last_lm,
                prev_inliers=prev_inl,
            )
            t.mapctx = mc
            self.m_all = tree_set(self.m_all, r, mc.map)
            self.ts_all = tree_set(self.ts_all, r, t._ts)
            if self.bow_all is not None and mc.kf_bow is not None:
                self.bow_all = self.bow_all.at[r].set(mc.kf_bow)
            self._dirty[r] = False
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
        associations to landmarks that exist in the authoritative pool."""
        from orbslamm_tpu.ops.orb import Features

        mB = tree_slice(self.m_all, r)  # follower's evolved copy
        mc = self.trackers[o].mapctx
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
            keep = (obs >= 0) & mc.map.lm_valid[jnp.maximum(obs, 0)]
            obs_clean = jnp.where(keep, obs, -1)
            new_slot = mc.insert_keyframe(
                mB.kf_pose[sl], mB.kf_K[sl], feats, obs_clean,
                mB.kf_frame_id[sl], mB.kf_timestamp[sl],
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
        if t._ts is None:
            t._ts = t._make_ts()
        self.m_all = tree_set(self.m_all, r, t.mapctx.map)
        self.ts_all = tree_set(self.ts_all, r, t._ts)
        if self.bow_all is not None and t.mapctx.kf_bow is not None:
            self.bow_all = self.bow_all.at[r].set(t.mapctx.kf_bow)
        self._dirty[r] = False

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
        self.flush()
        for r in range(len(self.trackers)):
            self._sync_tracker(r)
            self.trackers[r]._sync_from_ts()
