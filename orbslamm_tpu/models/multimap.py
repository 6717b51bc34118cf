"""Multi-map / multi-robot coordination (the ORBSLAMM MultiMapper).

Reference semantics re-created (MultiMapper.cc, SURVEY.md §3.5):
  * every robot tracks into its own active map; on tracking loss with an
    established map the robot gets a BRAND-NEW map and keeps mapping
    (Tracking.cc:330-366); a young map is reset instead (Tracking.cc:520);
  * a global registry holds all live maps; after every keyframe the newest
    keyframe is queried against every OTHER map's BoW database; a hit is
    verified by a cross-map Sim3 (SearchByBoW → Sim3 RANSAC, ≥15 BoW
    matches / ≥20 inliers — MultiMapper.cc:214,306);
  * on success the maps are MERGED: here the newer map's keyframes and
    landmarks are physically transformed by the Sim3 and appended into the
    base map's pools (the array-pool equivalent of the reference's
    attachment graph + UpdatePosesAndAdd, MultiMapper.cc:451-665), the
    duplicate landmarks at the seam are fused, an essential-graph
    optimization spans the merged map, and the robots that tracked the
    absorbed map switch to the base map with transformed state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models import loop_closing as lc_stage
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models.system import MapContext, RobotTracker, TrackingState
from orbslamm_tpu.utils.trace import get_tracer
from orbslamm_tpu.ops import bow, geometry as geo
from orbslamm_tpu.utils.config import SlamConfig


class MergeResult(NamedTuple):
    map: ms.MapState
    lm_remap: jax.Array  # [L_B] int32 — B landmark id → merged slot (-1 dropped)
    S_AB: jax.Array  # packed sim3: base-world ← absorbed-world
    n_evicted: jax.Array  # i32 — A landmarks evicted to make room for B's


@functools.partial(jax.jit, static_argnames=("cfg",))
def merge_maps(
    cfg: SlamConfig,
    mA: ms.MapState,
    mB: ms.MapState,
    S_cam_ab: jax.Array,  # sim3 mapping B-KF camera coords → A-KF camera coords
    slot_b: jax.Array,
    slot_a: jax.Array,
    n_kf_A: jax.Array,
) -> MergeResult:
    """Append map B into map A's pools, Sim3-transformed into A's world."""
    S_aw = geo.sim3_from_se3(mA.kf_pose[slot_a])
    S_bw = geo.sim3_from_se3(mB.kf_pose[slot_b])
    # x_wA = S_aw^-1 ∘ S_cam ∘ S_bw (x_wB)
    S_AB = geo.sim3_compose(
        geo.sim3_inv(S_aw), geo.sim3_compose(S_cam_ab, S_bw)
    )
    s_AB, R_AB, _ = geo.sim3_parts(S_AB)

    # --- landmarks -------------------------------------------------------
    # value-aware slot assignment: free slots first; if the pool overflows,
    # A's WORST landmarks (lowest found ratio) are evicted rather than B's
    # being silently dropped. Evicted slots' old observations are cleared
    # from A's keyframes so they cannot alias onto the transplanted points.
    LB = mB.lm_pos.shape[0]
    LA_pool = mA.lm_valid.shape[0]
    slots = ms.free_lm_slots(mA, LB, by_value=True)
    use = mB.lm_valid
    evict = use & mA.lm_valid[slots]
    n_evicted = evict.sum().astype(jnp.int32)
    evict_mask = jnp.zeros((LA_pool,), bool).at[
        jnp.where(evict, slots, LA_pool)
    ].set(True, mode="drop")
    dangling = (mA.kf_obs_lm >= 0) & evict_mask[jnp.maximum(mA.kf_obs_lm, 0)]
    mA = mA._replace(
        kf_obs_lm=jnp.where(dangling, -1, mA.kf_obs_lm),
        lm_valid=mA.lm_valid & ~evict_mask,
    )
    lm_remap = jnp.where(use, slots, -1)
    pos_A = geo.sim3_apply(S_AB, mB.lm_pos)
    normal_A = jnp.einsum("ij,lj->li", R_AB, mB.lm_normal)
    mA = ms.add_landmarks(
        mA,
        slots,
        use,
        pos_A,
        mB.lm_desc,
        normal_A,
        mB.lm_dist_min * s_AB,
        mB.lm_dist_max * s_AB,
        0,
    )
    # landmark bookkeeping that add_landmarks defaults: ref/first KF ids and
    # view counters carried over (shifted into the merged KF index space)
    LA = mA.lm_pos.shape[0]
    widx = jnp.where(use, slots, LA)
    mA = mA._replace(
        lm_ref_kf=mA.lm_ref_kf.at[widx].set(
            (n_kf_A + mB.lm_ref_kf).astype(jnp.int32), mode="drop"
        ),
        lm_first_kf=mA.lm_first_kf.at[widx].set(
            (n_kf_A + mB.lm_first_kf).astype(jnp.int32), mode="drop"
        ),
        lm_visible=mA.lm_visible.at[widx].set(mB.lm_visible, mode="drop"),
        lm_found=mA.lm_found.at[widx].set(mB.lm_found, mode="drop"),
    )

    # --- keyframes: B slot k → A slot n_kf_A + k -------------------------
    KB = mB.kf_pose.shape[0]
    KA = mA.kf_pose.shape[0]
    dest = jnp.where(mB.kf_valid, n_kf_A + jnp.arange(KB), KA)
    S_inv = geo.sim3_inv(S_AB)
    T_new = jax.vmap(
        lambda T: geo.sim3_to_se3(
            geo.sim3_compose(geo.sim3_from_se3(T), S_inv)
        )
    )(mB.kf_pose)
    obs_new = jnp.where(
        mB.kf_obs_lm >= 0, lm_remap[jnp.maximum(mB.kf_obs_lm, 0)], -1
    )
    mA = mA._replace(
        kf_pose=mA.kf_pose.at[dest].set(T_new, mode="drop"),
        kf_K=mA.kf_K.at[dest].set(mB.kf_K, mode="drop"),
        kf_valid=mA.kf_valid.at[dest].set(mB.kf_valid, mode="drop"),
        # SetNotFixed: absorbed origin keyframes lose their gauge-anchor
        # status (MultiMapper.cc:527, Optimizer.cc:99)
        kf_fixed=mA.kf_fixed.at[dest].set(False, mode="drop"),
        kf_frame_id=mA.kf_frame_id.at[dest].set(mB.kf_frame_id, mode="drop"),
        kf_timestamp=mA.kf_timestamp.at[dest].set(mB.kf_timestamp, mode="drop"),
        kf_xy=mA.kf_xy.at[dest].set(mB.kf_xy, mode="drop"),
        kf_desc=mA.kf_desc.at[dest].set(mB.kf_desc, mode="drop"),
        kf_level=mA.kf_level.at[dest].set(mB.kf_level, mode="drop"),
        kf_angle=mA.kf_angle.at[dest].set(mB.kf_angle, mode="drop"),
        kf_feat_valid=mA.kf_feat_valid.at[dest].set(mB.kf_feat_valid, mode="drop"),
        kf_obs_lm=mA.kf_obs_lm.at[dest].set(obs_new, mode="drop"),
        kf_ur=mA.kf_ur.at[dest].set(mB.kf_ur, mode="drop"),
        n_kf=jnp.maximum(mA.n_kf, n_kf_A + mB.n_kf),
    )
    # carry B's recorded loop edges (shifted into A's slot space) into A's
    # free rows — past seams must keep constraining future essential graphs
    # (KeyFrame::AddLoopEdge survives the merge, MultiMapper.cc:648-655)
    E = mA.loop_edges.shape[0]
    a_has = mA.loop_edges[:, 0] >= 0
    a_sorted = mA.loop_edges[jnp.argsort(~a_has, stable=True)]  # used first
    n_used = a_has.sum()
    b_has = mB.loop_edges[:, 0] >= 0
    b_sorted = mB.loop_edges[jnp.argsort(~b_has, stable=True)]
    b_sorted = jnp.where(b_sorted[:, 0:1] >= 0, b_sorted + n_kf_A, -1)
    rows = jnp.where(b_sorted[:, 0] >= 0, n_used + jnp.arange(E), 2 * E)
    mA = mA._replace(
        loop_edges=a_sorted.at[rows].set(b_sorted, mode="drop")
    )
    return MergeResult(map=mA, lm_remap=lm_remap, S_AB=S_AB,
                       n_evicted=n_evicted)


class MultiMapper:
    """Global registry + merge scanner shared by all robots
    (one instance per deployment, reference MultiMapper.cc:32)."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.maps: list[MapContext] = []
        self.robots: list[RobotTracker] = []
        self.voc: bow.Vocabulary | None = None
        if cfg.vocabulary_path:
            # pretrained vocabulary file (reference ORBvoc.txt): shared by
            # every map from the start — no lazy training, no with_bow
            # recompile mid-deployment
            self.voc = MapContext.load_vocabulary_file(cfg)
        self._key = jax.random.key(1)
        self.merges: list[tuple] = []
        # runtime multi-mapping toggle (reference Viewer menu "Multi-Mapping"
        # → Tracking::InformMultiMapping, Viewer.cc:131-152): OFF = loss
        # relocalizes instead of spawning a new map
        self.multi_mapping_enabled = cfg.multi_mapping
        # per-map newest→oldest rescan cursor (the MultiMapper.cc:124 walk,
        # amortized across keyframe events)
        self._rescan_cursor: dict[int, int] = {}
        # deferred batched scanning: keyframe events ENQUEUE query slots;
        # pump_merge_scans() dispatches ONE batched scoring program per
        # (map, base-map) pair and fetches the PREVIOUS round's results —
        # the fetch then rides behind whatever device work is already
        # queued instead of stalling the pipeline per keyframe (the
        # reference's MultiMapper thread polls asynchronously for the same
        # reason, MultiMapper.cc:43-70)
        self._scan_queue: dict[int, list[int]] = {}  # map_id -> slots
        self._scan_pending: list[dict] = []
        self._verify_pending: list[dict] = []  # dispatched Sim3 verifies
        self.scan_batch = 4  # static query-batch size (one compiled program)
        # failed Sim3 verifications back off for a few pump rounds — in an
        # overlap region the same base-map candidate keeps clearing the BoW
        # floor long before the geometry is verifiable, and each verify is
        # a full Sim3 RANSAC dispatch+fetch
        self._verify_cooldown: dict[tuple, int] = {}
        self._pump_round = 0

    # -- registry ----------------------------------------------------------
    def new_map(self) -> MapContext:
        mc = MapContext(self.cfg, voc=self.voc)
        self.maps.append(mc)
        return mc

    def add_robot(self, name: str = "") -> RobotTracker:
        name = name or f"robot{len(self.robots)}"
        t = RobotTracker(self.cfg, self.new_map(), name)
        t.on_keyframe = self._on_keyframe
        t.auto_reset_young = False  # loss handling belongs to _handle_loss
        self.robots.append(t)
        return t

    def live_maps(self) -> list[MapContext]:
        return [m for m in self.maps if m.merged_into is None]

    # -- per-frame driver --------------------------------------------------
    def process_frame(self, robot_idx: int, image, timestamp):
        t = self.robots[robot_idx]
        tr = get_tracer()
        with tr.span("track", robot=t.name):
            rec = t.process_frame(image, timestamp)
        if t.state == TrackingState.LOST and self.multi_mapping_enabled:
            self._handle_loss(t, float(timestamp))
        return rec

    def set_multi_mapping(self, on: bool):
        """Runtime toggle (the reference's Viewer "Multi-Mapping" menu →
        InformMultiMapping): OFF makes a lost robot relocalize against its
        current map instead of spawning a new one."""
        self.multi_mapping_enabled = bool(on)
        for t in self.robots:
            t.reloc_on_loss = not on
        get_tracer().event("multi_mapping_toggled", on=bool(on))

    def process_frames(self, robot_idx: int, images, timestamps):
        """Pipelined chunked driver: chunk k+1 is dispatched before chunk
        k's summaries are fetched (device never idles; keyframe events and
        loss handling run one chunk late, the reference's async-thread
        delay semantics). Init/loss frames fall back to the per-frame path
        with the usual new-map-on-loss handling."""
        t = self.robots[robot_idx]
        tr = get_tracer()
        recs = []
        pending = None

        def finish(tok):
            out = t._finish_chunk(tok)
            self.pump_merge_scans()  # once per chunk boundary
            if t.state == TrackingState.LOST and self.cfg.multi_mapping:
                self._handle_loss(t, out[-1].timestamp if out else 0.0)
            return out

        i, n = 0, len(timestamps)
        while i < n:
            cs = t.chunk_size
            if t.state == TrackingState.OK and t.use_fused and n - i >= cs:
                with tr.span("track", robot=t.name, chunk=cs):
                    tok = t._dispatch_chunk(images[i : i + cs],
                                            timestamps[i : i + cs])
                i += cs
                if pending is not None:
                    recs.extend(finish(pending))
                pending = tok
            else:
                if pending is not None:
                    recs.extend(finish(pending))
                    pending = None
                    continue  # state may have changed — re-evaluate
                recs.append(self.process_frame(robot_idx, images[i],
                                               float(timestamps[i])))
                i += 1
        if pending is not None:
            recs.extend(finish(pending))
        return recs

    def _handle_loss(self, t: RobotTracker, timestamp: float):
        if not self.multi_mapping_enabled:
            return  # relocalization path owns the loss (reloc_on_loss)
        tr = get_tracer()
        if t.mapctx.n_kf >= self.cfg.tracking.min_kfs_for_new_map:
            # keep the orphan map; continue mapping in a brand-new one
            # (the ORBSLAMM signature, Tracking.cc:330-366)
            t.switch_map(self.new_map())
            tr.incr("new_maps_on_loss")
            tr.event("new_map_on_loss", robot=t.name,
                     map_id=t.mapctx.map_id, ts=timestamp)
        else:
            # early loss → reset the young map (Tracking.cc:520-528); the
            # fresh map_id orphans the discarded generation's records so
            # they can never be resolved/transformed against the new map
            t.mapctx.map = ms.empty_map(self.cfg)
            t.mapctx.n_kf = 0
            if t.mapctx.kf_bow is not None:
                t.mapctx.kf_bow = jnp.zeros_like(t.mapctx.kf_bow)
            t.mapctx.renew_id()
            t.switch_map(t.mapctx)

    # -- keyframe hook: vocabulary + merge scan ----------------------------
    def _on_keyframe(self, tracker: RobotTracker, slot: int):
        if self.voc is None:
            if tracker.mapctx.ensure_vocabulary():
                self.voc = tracker.mapctx.voc
                for mc in self.maps:
                    if mc.voc is None:
                        mc.voc = self.voc
                        mc._alloc_bow()
                        kv = np.asarray(mc.map.kf_valid)
                        for s in np.nonzero(kv)[0]:
                            mc.update_bow_row(int(s))
            else:
                return
        self.enqueue_scan(tracker.mapctx, slot)
        # the pump (dispatch + deferred fetch) runs at CHUNK boundaries —
        # pumping per keyframe would fetch same-finish dispatches and stall
        # on their execution (streams.StreamBank.on_chunk_end /
        # process_frames wire it); the plain per-frame path pumps here
        if not getattr(tracker, "_in_chunk_finish", False):
            self.pump_merge_scans()

    # -- merging -----------------------------------------------------------
    def enqueue_scan(self, mcB: MapContext, slot: int):
        """Queue a keyframe for cross-map scanning: the new keyframe plus a
        rotating newest→oldest rescan window (the reference walks EVERY
        keyframe of the newer map against each base map's database, newest
        first, MultiMapper.cc:124 — the cursor amortizes that full coverage
        across keyframe events)."""
        cfg = self.cfg
        if mcB.n_kf < cfg.loop.min_kfs_for_merge or mcB.kf_bow is None:
            return
        slots = [slot]
        cursor = self._rescan_cursor.get(mcB.map_id, mcB.n_kf - 1)
        for _ in range(cfg.loop.merge_rescan_per_kf):
            cursor -= 1
            if cursor < 0:
                cursor = mcB.n_kf - 1
            if cursor not in slots:
                slots.append(cursor)
        self._rescan_cursor[mcB.map_id] = cursor
        q = self._scan_queue.setdefault(mcB.map_id, [])
        q.extend(s for s in slots if s not in q)
        del q[: max(0, len(q) - 2 * self.scan_batch)]  # cap; cursor re-covers

    def pump_merge_scans(self) -> bool:
        """One round of the deferred scan pipeline: fetch + verify the
        PREVIOUS round's candidate scores (they are already computed — the
        fetch rides behind any queued device work), then dispatch a new
        batched scoring program for the queued slots. Returns True if a
        merge happened."""
        self._pump_round += 1
        merged = self._fetch_and_verify_scans()
        if merged:
            self._scan_pending = []
            self._verify_pending = []
            self._scan_queue.clear()
            return True
        self._dispatch_scans()
        return False

    def flush_merge_scans(self, rounds: int = 3) -> bool:
        """Drain the scan pipeline synchronously (dispatch + fetch) —
        end-of-run completeness, and tests that need immediate results."""
        for _ in range(rounds):
            if self.pump_merge_scans():
                return True
        return self._fetch_and_verify_scans()

    def _dispatch_scans(self):
        cfg = self.cfg
        for map_id, slots in list(self._scan_queue.items()):
            mcB = next((m for m in self.maps if m.map_id == map_id), None)
            if mcB is None or mcB.merged_into is not None or not slots:
                self._scan_queue.pop(map_id, None)
                continue
            take = slots[-self.scan_batch:]
            self._scan_queue[map_id] = slots[: -len(take)]
            padded = (take + [take[0]] * self.scan_batch)[: self.scan_batch]
            for mcA in self.live_maps():
                if mcA is mcB or mcA.kf_bow is None:
                    continue
                if mcA.n_kf < cfg.loop.min_kfs_for_merge:
                    continue
                if mcA.n_kf + mcB.n_kf >= cfg.capacity.max_keyframes:
                    get_tracer().event(
                        "merge_skipped_capacity", base=mcA.map_id,
                        absorbed=mcB.map_id, n_kf_base=mcA.n_kf,
                        n_kf_absorbed=mcB.n_kf,
                        capacity=cfg.capacity.max_keyframes,
                    )
                    continue
                out = lc_stage.batched_merge_scan_scores(
                    cfg, mcB.map, mcB.kf_bow,
                    jnp.asarray(padded, jnp.int32), mcA.map, mcA.kf_bow,
                )
                self._scan_pending.append({
                    "mcB": mcB, "mcA": mcA, "slots": take, "out": out,
                })

    def _fetch_and_verify_scans(self) -> bool:
        """Resolve LAST round's Sim3 verifications (their device results are
        ready — the fetch is ~free), then turn this round's fetched scores
        into NEW async Sim3 dispatches. Both pipeline stages defer their
        fetch one pump, so no stage ever stalls the chunk loop on device
        compute (the reference's MultiMapper thread achieves the same by
        running verification asynchronously, MultiMapper.cc:43-70)."""
        verifies, self._verify_pending = self._verify_pending, []
        for v in verifies:
            mcB, mcA = v["mcB"], v["mcA"]
            if mcB.merged_into is not None or mcA.merged_into is not None:
                continue
            ls = v["ls"]
            if bool(ls.success):
                slot, cand = v["slot"], v["cand"]
                # map-swap rule (MultiMapper.cc:372-393): the
                # globally-anchored map must absorb, never be absorbed —
                # the older map (lower id; it holds the deployment's
                # original gauge) stays the base
                if mcB.map_id < mcA.map_id:
                    self._do_merge(mcB, mcA, geo.sim3_inv(ls.S_ba),
                                   v["cand"], v["slot"])
                else:
                    self._do_merge(mcA, mcB, ls.S_ba, slot, cand)
                self._verify_pending = []
                return True
            self._verify_cooldown[
                (mcB.map_id, mcA.map_id, v["cand"])
            ] = self._pump_round
        pending, self._scan_pending = self._scan_pending, []
        for tok in pending:
            mcB, mcA = tok["mcB"], tok["mcA"]
            if mcB.merged_into is not None or mcA.merged_into is not None:
                continue
            with get_tracer().span("merge_scan", absorbed=mcB.map_id,
                                   base=mcA.map_id):
                self._dispatch_verifies(tok)
        return False

    def _dispatch_verifies(self, tok):
        """Floor + group selection on one fetched score batch; DISPATCH the
        Sim3 verification of each selected candidate (no fetch here)."""
        cfg = self.cfg
        mcB, mcA = tok["mcB"], tok["mcA"]
        scores_q, min_q, acc_q, nb_q = (np.asarray(x) for x in tok["out"])
        for qi, slot in enumerate(tok["slots"]):
            scores = scores_q[qi]
            floor = max(float(min_q[qi]), 0.015)
            if float(scores.max()) < floor:
                continue
            acc = np.where(scores >= floor, acc_q[qi], -1.0)
            nb = nb_q[qi]
            masked = acc.copy()
            for _ in range(cfg.loop.top_k_candidates):
                rep = int(masked.argmax())
                if masked[rep] <= 0:
                    break
                # verify the best-scoring INDIVIDUAL member of the winning
                # group (the reference's pBestCandidateKF per accumulated
                # group, KeyFrameDatabase.cc:170-190)
                cand = int(np.argmax(np.where(nb[rep], scores, -1.0)))
                masked[nb[rep]] = -1.0
                key = (mcB.map_id, mcA.map_id, cand)
                if self._pump_round - self._verify_cooldown.get(key, -99) < 2:
                    continue
                self._key, sub = jax.random.split(self._key)
                ls = lc_stage.compute_loop_sim3_cross(
                    cfg, mcB.map, mcA.map, jnp.int32(slot), jnp.int32(cand),
                    sub,
                )  # async: resolved at the NEXT pump
                self._verify_pending.append({
                    "mcB": mcB, "mcA": mcA, "slot": slot, "cand": cand,
                    "ls": ls,
                })

    def try_merge(self, tracker: RobotTracker, slot: int) -> bool:
        """Synchronous scan+verify of one keyframe (immediate-result path;
        the keyframe event flow uses enqueue_scan + pump_merge_scans)."""
        mcB = tracker.mapctx
        self.enqueue_scan(mcB, slot)
        return self.flush_merge_scans()

    def _do_merge(self, mcA: MapContext, mcB: MapContext, S_cam, slot_b: int, slot_a: int):
        tr = get_tracer()
        tr.event("map_merge", absorbed=mcB.map_id, base=mcA.map_id,
                 slot_b=slot_b, slot_a=slot_a)
        tr.incr("map_merges")
        with tr.span("merge", absorbed=mcB.map_id, base=mcA.map_id):
            self._do_merge_inner(mcA, mcB, S_cam, slot_b, slot_a)

    def _do_merge_inner(self, mcA: MapContext, mcB: MapContext, S_cam, slot_b: int, slot_a: int):
        cfg = self.cfg
        nA = mcA.n_kf
        res = merge_maps(
            cfg, mcA.map, mcB.map, S_cam, jnp.int32(slot_b), jnp.int32(slot_a),
            jnp.int32(nA),
        )
        mcA.map = res.map
        n_evicted = int(res.n_evicted)
        if n_evicted:
            tr = get_tracer()
            tr.event("merge_landmarks_evicted", base=mcA.map_id,
                     absorbed=mcB.map_id, n_evicted=n_evicted)
        merged_slot_b = nA + slot_b
        mcA.n_kf = nA + mcB.n_kf
        # anchors for post-correction rebases: the essential graph + GBA
        # below move the merged map under every camera. A-side robots ride
        # A's newest keyframe; B-side robots must ride THEIR OWN transplanted
        # newest keyframe — the seam correction moves the B cluster by the
        # full inter-map drift, which A's anchor knows nothing about
        # (System.cc:470-499 Tcr semantics, per side).
        anchor = nA - 1
        anchor_b = nA + mcB.n_kf - 1
        T_anchor_before = np.asarray(mcA.map.kf_pose[anchor])
        T_anchor_b_before = np.asarray(mcA.map.kf_pose[anchor_b])
        # BoW rows of the absorbed keyframes (appearance is unchanged)
        mcA.kf_bow = jax.lax.dynamic_update_slice(
            mcA.kf_bow, jax.lax.dynamic_slice(
                mcB.kf_bow, (0, 0), (mcB.n_kf, mcB.kf_bow.shape[1])
            ), (nA, 0)
        )
        # seam refinement: essential-graph optimization with the merge pair
        # as the loop edge (MMOptimizeEssentialGraph, MultiMapper.cc:646)
        mcA.map = lc_stage.correct_loop(
            cfg, mcA.map, jnp.int32(merged_slot_b), jnp.int32(slot_a), S_cam
        )
        # fuse duplicate landmarks around the seam (SearchAndFuse, :668)
        for s in (merged_slot_b, slot_a):
            mcA.map = lm_stage.fuse_neighbors(cfg, mcA.map, jnp.int32(s))
        # one immediate GBA slice; the rest run overlapped at chunk
        # boundaries (the reference's detached RunGlobalBundleAdjustmentonMap
        # with abort-on-new-event, LoopClosing.cc:812 — re-scheduling on a
        # fresh merge is the abort analog)
        mcA.map, gba_cost = lc_stage.global_bundle_adjust(
            cfg, mcA.map, iters=mcA.gba_slice_iters,
            cg_iters=mcA.gba_cg_iters,
        )
        mcA.schedule_gba(first_cost=float(gba_cost))
        T_anchor_after = np.asarray(mcA.map.kf_pose[anchor])
        # rebase record for the StreamBank's shared refresh (consumed there)
        mcA.last_merge_rebase = (T_anchor_before, T_anchor_after)
        # owner-side robots (already tracking A) ride the correction; their
        # device TrackState is rebuilt lazily with a fresh indicator
        A_delta = np.linalg.inv(T_anchor_before) @ T_anchor_after
        for r in self.robots:
            if r.mapctx is mcA:
                r._sync_from_ts()
                r.T_cw = jnp.asarray(np.asarray(r.T_cw) @ A_delta)
                r.last_T = r.T_cw
                r.prev_inliers = 0  # collapse gate disarmed for one frame
        # switch every robot that tracked B onto the merged map; after the
        # S_AB adoption their poses are in PRE-correction merged coordinates
        # — thread the B-anchor's essential-graph/GBA movement through
        T_anchor_b_after = np.asarray(mcA.map.kf_pose[anchor_b])
        B_delta = np.linalg.inv(T_anchor_b_before) @ T_anchor_b_after
        for r in self.robots:
            if r.mapctx is mcB:
                r.adopt_merged_map(mcA, res.S_AB, res.lm_remap)
                r.T_cw = jnp.asarray(np.asarray(r.T_cw) @ B_delta)
                r.last_T = r.T_cw
        # transform B's recorded frame trajectory into A's world: the frozen
        # absolute poses ride the Sim3, and the reference-KF decomposition
        # is re-pointed at the transplanted keyframe slots (slot += n_kf_A)
        # with its relative translation rescaled by the merge scale — after
        # this, B-era frames resolve against A's CURRENT keyframe poses and
        # ride every later correction (System.cc:470-499 semantics)
        S_inv = geo.sim3_inv(res.S_AB)
        s_AB = float(geo.sim3_parts(res.S_AB)[0])
        retro = [f for r in self.robots for f in r.frames
                 if f.map_id == mcB.map_id and f.state == "OK"]
        if retro:
            # ONE batched dispatch for all records (a per-record device op
            # chain costs two relay round trips each — seconds at merge time)
            T_all = jnp.asarray(np.stack([f.T_cw for f in retro]))
            T_new_all = np.asarray(jax.vmap(
                lambda T: geo.sim3_to_se3(
                    geo.sim3_compose(geo.sim3_from_se3(T), S_inv)
                )
            )(T_all))
            for f, T_n in zip(retro, T_new_all):
                f.T_cw = T_n
                f.map_id = mcA.map_id
                if f.ref_slot >= 0:
                    f.ref_slot += nA
                if f.T_rel is not None:
                    T = np.array(f.T_rel)
                    T[:3, 3] *= s_AB
                    f.T_rel = T
        mcB.merged_into = mcA
        self.merges.append((mcB.map_id, mcA.map_id, slot_b, slot_a))

    def summary(self) -> dict:
        return {
            "n_maps": len(self.live_maps()),
            "n_robots": len(self.robots),
            "merges": list(self.merges),
            "maps": [m.summary() for m in self.live_maps()],
        }
