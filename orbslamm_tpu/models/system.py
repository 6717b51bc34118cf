"""Host-driven SLAM sessions: maps, robot trackers, and the single-map facade.

The reference runs tracking / local mapping / loop closing as free threads
with queues and usleep polling (SURVEY.md §2.3); here the host sequences
jitted stages per frame — mapping work happens synchronously on keyframe
insertion (stage scheduling replaces queue backpressure). The tracker state
machine mirrors Tracking.h:92 {NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST}.

Structure (mirrors the reference decomposition):
  * MapContext   — one map + its keyframe BoW database + mapping stages
                   (Map + KeyFrameDatabase + LocalMapping + LoopClosing)
  * RobotTracker — one robot's frame-to-frame tracking state (Tracking),
                   pointing at its active MapContext; on tracking loss the
                   owner (models/multimap.MultiMapper) gives it a NEW map —
                   ORBSLAMM's continuous-mapping behavior (Tracking.cc:330).
  * MonocularSession — single-robot single-map facade (System analog) used
                   by tests and simple pipelines.
"""

from __future__ import annotations

import enum
import functools
import zlib
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models import loop_closing as lc_stage
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models import tracking as trk
from orbslamm_tpu.models import fused
from orbslamm_tpu.ops import bow, geometry as geo, orb as orb_ops, ransac
from orbslamm_tpu.ops.orb import Features
from orbslamm_tpu.utils.trace import get_tracer
from orbslamm_tpu.utils.config import SlamConfig


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@functools.partial(jax.jit, static_argnames=("cfg",))
def _create_initial_map(
    cfg: SlamConfig,
    m: ms.MapState,
    ref: Features,
    cur: Features,
    match_idx: jax.Array,
    init: ransac.InitResult,
    K: jax.Array,
    frame_ref,
    frame_cur,
    ts_ref,
    ts_cur,
) -> ms.MapState:
    """Two keyframes + triangulated landmarks, median-depth normalized
    (reference CreateInitialMapMonocular, Tracking.cc:685-766)."""
    z = init.points1[:, 2]
    zs = jnp.sort(jnp.where(init.inliers, z, jnp.inf))
    cnt = init.inliers.sum()
    med = zs[jnp.maximum((cnt - 1) // 2, 0)]
    scale = 1.0 / jnp.maximum(med, 1e-6)
    pts = init.points1 * scale
    T21 = init.T21.at[:3, 3].multiply(scale)

    Mfeat = ref.valid.shape[0]
    slots = jnp.arange(Mfeat, dtype=jnp.int32)  # empty pool → slot i per feature i
    d1 = jnp.linalg.norm(pts, axis=-1)
    normal = pts / jnp.maximum(d1[:, None], 1e-9)
    lvl = ref.level.astype(jnp.float32)
    dmax = d1 * cfg.orb.scale_factor**lvl
    dmin = dmax / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
    m = ms.add_landmarks(m, slots, init.inliers, pts, ref.desc, normal, dmin, dmax, 0)

    obs_ref = jnp.where(init.inliers, slots, -1)
    m = ms.insert_keyframe(
        m, jnp.int32(0), jnp.eye(4), K, ref, obs_ref, frame_ref, ts_ref, fixed=True
    )
    obs_cur = jnp.full((Mfeat,), -1, jnp.int32)
    tgt = jnp.where(init.inliers, match_idx, Mfeat)
    obs_cur = obs_cur.at[tgt].set(jnp.where(init.inliers, slots, -1), mode="drop")
    m = ms.insert_keyframe(m, jnp.int32(1), T21, K, cur, obs_cur, frame_cur, ts_cur)
    return m


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("m_out",))
def _truncate_init(ref: Features, cur: Features, match_idx, points1, inliers,
                   m_out: int):
    """Reduce an oversized init extraction (OrbConfig.init_features >
    max_keypoints) to the map's per-frame capacity, keeping ALL two-view
    inliers first and back-filling by response. Returns (ref', cur',
    match_idx', points1', inliers') with [m_out] shapes."""
    Mi = ref.valid.shape[0]
    # reference side: inliers outrank everything, then response
    key_r = jnp.where(inliers & ref.valid, 1e6 + ref.response,
                      jnp.where(ref.valid, ref.response, -1e9))
    _, idx_r = jax.lax.top_k(key_r, m_out)
    inl2 = inliers[idx_r]
    pts2 = points1[idx_r]
    ref2 = jax.tree.map(lambda a: a[idx_r] if a is not None else None, ref)
    # current side: matched partners of kept inliers outrank everything
    partner = jnp.zeros((Mi,), bool).at[
        jnp.where(inl2, match_idx[idx_r], Mi)
    ].set(True, mode="drop")
    key_c = jnp.where(partner, 1e6 + cur.response,
                      jnp.where(cur.valid, cur.response, -1e9))
    _, idx_c = jax.lax.top_k(key_c, m_out)
    cur2 = jax.tree.map(lambda a: a[idx_c] if a is not None else None, cur)
    inv = jnp.full((Mi,), m_out, jnp.int32).at[idx_c].set(
        jnp.arange(m_out, dtype=jnp.int32)
    )
    idx2 = inv[match_idx[idx_r]]
    inl2 &= idx2 < m_out
    idx2 = jnp.minimum(idx2, m_out - 1)
    return ref2, cur2, idx2, pts2, inl2


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    T_cw: np.ndarray  # absolute pose frozen at record time (fallback)
    state: str
    n_inliers: int
    map_id: int = 0
    # reference-keyframe decomposition (System.cc:470-499): when set, the
    # frame's EXPORT pose is T_rel @ <current pose of keyframe ref_slot> so
    # the whole trajectory rides later loop/GBA/merge corrections. -1 =
    # no reference (bootstrap frames, orphaned followers) → frozen T_cw.
    ref_slot: int = -1
    T_rel: np.ndarray | None = None


def resolve_frame_poses(frames) -> list[np.ndarray]:
    """Export-time pose recovery through reference keyframes (the
    reference's SaveTrajectory* Tcr-chain, System.cc:470-499). For each
    record: T_rel @ current kf_pose[ref_slot] of the record's map when the
    reference keyframe still exists, else the frozen absolute pose. Maps
    are found through the MapContext registry by record map_id."""
    by_map: dict[int, list[int]] = {}
    for i, f in enumerate(frames):
        by_map.setdefault(f.map_id, []).append(i)
    out: list[np.ndarray] = [f.T_cw for f in frames]
    for mid, idxs in by_map.items():
        mc = MapContext.registry().get(mid)
        if mc is None:
            continue
        kf_pose = None
        for i in idxs:
            f = frames[i]
            if f.state != "OK" or f.T_rel is None or f.ref_slot < 0:
                continue
            if f.ref_slot >= mc.n_kf:
                continue
            if kf_pose is None:  # one fetch per map
                kf_pose = np.asarray(mc.map.kf_pose)
                kf_valid = np.asarray(mc.map.kf_valid)
            if not kf_valid[f.ref_slot]:
                continue  # culled reference keyframe → frozen fallback
            out[i] = np.asarray(f.T_rel) @ kf_pose[f.ref_slot]
    return out


class MapContext:
    """One map (Map + KeyFrameDatabase + mapping stages)."""

    _next_id = 0
    _registry = None  # map_id -> MapContext (weak), for record resolution

    @classmethod
    def registry(cls) -> "weakref.WeakValueDictionary":
        import weakref

        if cls._registry is None:
            cls._registry = weakref.WeakValueDictionary()
        return cls._registry

    def __init__(self, cfg: SlamConfig, voc: bow.Vocabulary | None = None):
        self.cfg = cfg
        self.map = ms.empty_map(cfg)
        self.n_kf = 0
        self.map_id = MapContext._next_id
        MapContext._next_id += 1
        MapContext.registry()[self.map_id] = self
        self.voc = voc
        self.kf_bow = None
        if voc is None and cfg.vocabulary_path:
            # a file-backed vocabulary (the reference's mandatory pretrained
            # ORBvoc.txt, System.cc:167-168) is available from frame 0 —
            # loading it eagerly means every chunk program compiles with_bow
            # ONCE instead of recompiling when a lazily-trained vocabulary
            # appears mid-run
            self.ensure_vocabulary()
        elif voc is not None:
            self._alloc_bow()
        self.last_loop_kf = -(10**9)
        self.loops_closed: list = []
        # covisibility-consistency chains (LoopClosing.cc:158-217): each
        # entry is (group member set, consecutive-detection count)
        self._consist: list[tuple[set, int]] = []
        # failed Sim3 verifications back off (candidate -> slot of the last
        # failed attempt): in an overlap region the same candidate keeps
        # clearing the BoW floor long before its geometry verifies, and
        # every verify is a blocking device dispatch+fetch
        self._loop_verify_cooldown: dict[int, int] = {}
        # overlapped global BA (the reference's detached, abortable GBA
        # thread, LoopClosing.cc:585,656-810, TPU-style): a loop closure /
        # merge schedules LM slices which run one per chunk boundary OVER
        # THE CURRENT MAP STATE — keyframes inserted between slices join
        # the problem automatically, so the reference's spanning-tree
        # reconciliation of a stale snapshot is unnecessary. A new
        # loop/merge simply re-schedules (the abort analog). Scheduling is
        # ADAPTIVE: each slice reads back the BA cost and stops early on
        # convergence (or runs up to gba_max_slices on a big merged map).
        self.gba_remaining = 0
        self.gba_max_slices = 8
        self.gba_slice_iters = 2
        # CG budget per slice: slices repeat at chunk boundaries, so each
        # one only needs enough Krylov depth to make progress — 16 keeps a
        # slice inside the two-robot chunk budget on the real chip
        self.gba_cg_iters = 16
        self._gba_last_cost = None
        # device scalar of the most recent slice's cost, resolved ONE slice
        # late so a slice dispatch never blocks the host on GBA compute
        self._gba_cost_pending = None
        self.merged_into: "MapContext | None" = None
        # (T_anchor_before, T_anchor_after) of the latest merge correction —
        # consumed by the StreamBank's shared refresh to rebase device
        # tracking states through the map movement
        self.last_merge_rebase = None
        # runtime toggle replacing the reference's LoopClosing thread
        # enable/disable; also gates lazy vocabulary training
        self.loop_closing_enabled = True

    def _alloc_bow(self):
        K_cap = self.map.kf_pose.shape[0]
        self.kf_bow = jnp.zeros((K_cap, self.voc.n_words), jnp.float32)

    def renew_id(self):
        """A young-map reset discards the map's content; records made in
        the old generation must NOT resolve against (or be transformed
        with) the new one — retire the old id and take a fresh one."""
        MapContext.registry().pop(self.map_id, None)
        self.map_id = MapContext._next_id
        MapContext._next_id += 1
        MapContext.registry()[self.map_id] = self

    # -- keyframe insertion + mapping stages ------------------------------
    def insert_keyframe(self, T_cw, K, feats: Features, feat_lm, frame_id,
                        timestamp, light: bool = False):
        """Insert + run the local-mapping pipeline. ``light`` skips
        triangulation / local BA / culling — for keyframes REPLAYED from a
        follower's chunk-epoch copy, which already ran the full pipeline
        there (only the duplicate-landmark fuse at the seam is re-run; the
        owner's own subsequent local BAs polish the poses)."""
        tr = get_tracer()
        slot = jnp.int32(self.n_kf)
        with tr.span("local_mapping", map_id=self.map_id, slot=self.n_kf):
            self.map = ms.insert_keyframe(
                self.map, slot, T_cw, K, feats, feat_lm, frame_id, timestamp
            )
            self.n_kf += 1
            if feats.depth is not None:
                # stereo/RGB-D: spawn close landmarks straight from depth
                # (Tracking::CreateNewKeyFrame stereo branch)
                self.map = lm_stage.create_depth_landmarks(
                    self.cfg, self.map, slot, feats.depth
                )
            if light:
                self.map = lm_stage.fuse_neighbors(self.cfg, self.map, slot)
            else:
                self.map = lm_stage.triangulate_new_landmarks(self.cfg, self.map, slot)
                self.map = lm_stage.fuse_neighbors(self.cfg, self.map, slot)
                self.map = lm_stage.local_bundle_adjustment(self.cfg, self.map, slot)
                self.map = lm_stage.cull_landmarks(self.cfg, self.map, slot)
                self.map = lm_stage.cull_keyframes(self.cfg, self.map, slot)
        tr.incr("keyframes_inserted")
        tr.event("keyframe", map_id=self.map_id, slot=self.n_kf - 1,
                 frame_id=int(frame_id), ts=float(timestamp))
        return int(slot)

    # -- BoW database -----------------------------------------------------
    _voc_file_cache: dict = {}

    @staticmethod
    def load_vocabulary_file(cfg: SlamConfig) -> bow.Vocabulary:
        """Load (and cache) the configured pretrained vocabulary file —
        DBoW2 ORBvoc.txt text format or this framework's .npz."""
        path = str(cfg.vocabulary_path)
        voc = MapContext._voc_file_cache.get(path)
        if voc is None:
            if path.endswith(".npz"):
                voc = bow.load_vocabulary_npz(path)
            else:
                voc = bow.load_orb_vocabulary_text(
                    path, max_depth=cfg.loop.vocab_depth + 1
                )
            MapContext._voc_file_cache[path] = voc
        return voc

    def ensure_vocabulary(self) -> bool:
        """Provide the vocabulary: load the pretrained DBoW2 file when
        configured (the reference's mandatory ORBvoc.txt,
        System.cc:167-168), else train from this map's descriptors."""
        if self.voc is not None:
            return True
        if self.cfg.vocabulary_path:
            self.voc = MapContext.load_vocabulary_file(self.cfg)
        else:
            if self.n_kf < 4:
                return False
            kv = np.asarray(self.map.kf_valid)
            descs = [
                np.asarray(self.map.kf_desc[s])[np.asarray(self.map.kf_feat_valid[s])]
                for s in np.nonzero(kv)[0]
            ]
            self.voc = bow.build_vocabulary(
                np.concatenate(descs),
                branching=self.cfg.loop.vocab_branching,
                depth=self.cfg.loop.vocab_depth,
                iters=self.cfg.loop.vocab_iters,
            )
        self._alloc_bow()
        kv = np.asarray(self.map.kf_valid)
        self.update_bow_rows([int(s) for s in np.nonzero(kv)[0]])
        return True

    def update_bow_row(self, slot: int):
        self.update_bow_rows([slot])

    def update_bow_rows(self, slots):
        """Batched, single-dispatch BoW database update (KeyFrameDatabase::add
        analog). On remote-attached TPUs the eager path costs one network
        round trip per primitive op — this is the whole transform in one."""
        if self.voc is None or len(slots) == 0:
            return
        self.kf_bow = bow.update_bow_rows(
            self.voc, self.map.kf_desc, self.map.kf_feat_valid, self.kf_bow,
            jnp.asarray(slots, jnp.int32),
        )

    # -- same-map loop closing --------------------------------------------
    def loop_scan(self, slots) -> dict:
        """Candidate scores for a batch of new keyframes in ONE dispatch +
        ONE fetch (KeyFrameDatabase::DetectLoopCandidates for the whole
        chunk). Returns {slot: (scores-with-mask [K], min_score)} for
        feeding try_close_loop's ``precomputed``."""
        cfg = self.cfg
        if self.voc is None or not slots or self.n_kf < cfg.loop.min_kfs_for_merge:
            return {}
        scores, allowed, min_score = lc_stage.batched_loop_candidates(
            cfg, self.map, self.kf_bow, jnp.asarray(slots, jnp.int32),
            min_gap=cfg.loop.kfs_between_loops,
        )
        sc = np.asarray(jnp.where(allowed, scores, -1.0))
        msc = np.asarray(min_score)
        return {s: (sc[i], float(msc[i])) for i, s in enumerate(slots)}

    def try_close_loop(self, slot: int, key, precomputed=None) -> bool:
        cfg = self.cfg
        if (
            not self.loop_closing_enabled
            or self.voc is None
            or self.n_kf < cfg.loop.min_kfs_for_merge
            or slot - self.last_loop_kf < cfg.loop.kfs_between_loops
        ):
            return False
        tr = get_tracer()
        with tr.span("loop_detect", map_id=self.map_id):
            if precomputed is None:
                scores, allowed, min_score = lc_stage.loop_candidates(
                    cfg, self.map, self.kf_bow, jnp.int32(slot),
                    min_gap=cfg.loop.kfs_between_loops,
                )
                sc = np.asarray(jnp.where(allowed, scores, -1.0))
                min_score = float(min_score)
            else:
                sc, min_score = precomputed
            # minScore normalization (LoopClosing.cc:131): candidates must
            # score at least as well as the worst covisible keyframe
            floor = max(min_score, 0.015)
            if float(sc.max()) < floor:
                # no candidates at all → consistency chains reset
                # (LoopClosing.cc:152)
                self._consist = []
                return False
            # covisibility-GROUP accumulation + top-k representatives
            # (KeyFrameDatabase.cc:129-200): under perceptual aliasing the
            # raw argmax is unreliable; places (groups) rank better
            acc_d, nb_d = lc_stage.candidate_groups(
                cfg, self.map, jnp.asarray(np.where(sc >= floor, sc, -1.0))
            )
            acc = np.asarray(acc_d)
            nb = np.asarray(nb_d)
            cands: list[int] = []
            masked = acc.copy()
            for _ in range(cfg.loop.top_k_candidates):
                c = int(masked.argmax())
                if masked[c] <= 0:
                    break
                # best-scoring individual member of the accumulated group
                # (reference pBestCandidateKF, KeyFrameDatabase.cc:170-190)
                cands.append(int(np.argmax(np.where(nb[c], sc, -1.0))))
                masked[nb[c]] = -1.0  # dedupe: drop the whole group
            # consistency over consecutive keyframes (LoopClosing.cc:158-217):
            # a candidate group must reappear for covisibility_consistency
            # consecutive detections before geometric verification
            prev = self._consist
            new_groups: list[tuple[set, int]] = []
            enough: list[int] = []
            for c in cands:
                group = set(np.nonzero(nb[c])[0].tolist())
                count = 0
                for pg, pc in prev:
                    if group & pg:
                        count = max(count, pc + 1)
                new_groups.append((group, count))
                if count >= cfg.loop.covisibility_consistency:
                    enough.append(c)
            self._consist = new_groups
            if not enough:
                return False
            ls, cand = None, -1
            for c in enough:
                if slot - self._loop_verify_cooldown.get(c, -(10**9)) < 8:
                    continue
                ls_c = lc_stage.compute_loop_sim3(
                    cfg, self.map, jnp.int32(slot), jnp.int32(c), key
                )
                if bool(ls_c.success):
                    ls, cand = ls_c, c
                    break
                self._loop_verify_cooldown[c] = slot
        if ls is None:
            return False
        with tr.span("loop_correct", map_id=self.map_id):
            self.map = lc_stage.correct_loop(
                cfg, self.map, jnp.int32(slot), jnp.int32(cand), ls.S_ba
            )
            # one immediate slice to stabilize the seam; the rest of the
            # global BA runs overlapped, one slice per chunk boundary
            self.map, cost = lc_stage.global_bundle_adjust(
                cfg, self.map, iters=self.gba_slice_iters,
                cg_iters=self.gba_cg_iters,
            )
            self.schedule_gba(first_cost=float(cost))
        self.last_loop_kf = slot
        self._consist = []
        self.loops_closed.append((slot, cand, int(ls.n_inliers)))
        tr.incr("loops_closed")
        tr.event("loop_closed", map_id=self.map_id, slot=slot, cand=cand,
                 inliers=int(ls.n_inliers))
        return True

    def schedule_gba(self, first_cost: float | None = None):
        """(Re-)schedule the overlapped global BA — called by loop closures
        and merges. Re-scheduling while slices remain is the reference's
        abort-and-restart of its background GBA thread."""
        self.gba_remaining = self.gba_max_slices
        self._gba_last_cost = first_cost
        self._gba_cost_pending = None

    def gba_resolve_cost(self, cost: float) -> None:
        """Adaptive convergence bookkeeping from a slice's (asynchronously
        fetched) final cost: stop the schedule when relative improvement
        stalls — no wasted slices on a small map, enough on a merged one."""
        tr = get_tracer()
        if (
            self._gba_last_cost is not None
            and cost >= self._gba_last_cost * (1.0 - 1e-3)
        ):
            tr.event("gba_converged", map_id=self.map_id, cost=cost,
                     slices_left=self.gba_remaining)
            self.gba_remaining = 0
        self._gba_last_cost = cost

    def gba_slice(self) -> bool:
        """Run one overlapped global-BA slice if any are scheduled. Returns
        True when a slice ran. Called at chunk boundaries — the TPU-shaped
        equivalent of the reference's background GBA thread making progress
        between keyframe insertions. NON-BLOCKING: the dispatch returns
        immediately; the slice's cost is resolved at the NEXT boundary
        (by which time the device has finished it), so the host never
        stalls on GBA compute."""
        if self._gba_cost_pending is not None:
            cost = float(self._gba_cost_pending)  # ready: computed last slice
            self._gba_cost_pending = None
            self.gba_resolve_cost(cost)
        if self.gba_remaining <= 0:
            return False
        tr = get_tracer()
        with tr.span("gba_slice", map_id=self.map_id,
                     remaining=self.gba_remaining):
            self.map, self._gba_cost_pending = lc_stage.global_bundle_adjust(
                self.cfg, self.map, iters=self.gba_slice_iters,
                cg_iters=self.gba_cg_iters,
            )
        self.gba_remaining -= 1
        tr.incr("gba_slices")
        return True

    def summary(self) -> dict:
        s = ms.as_numpy_summary(self.map)
        s["map_id"] = self.map_id
        return s


class RobotTracker:
    """Per-robot frame-to-frame tracking state (Tracking.cc analog)."""

    def __init__(self, cfg: SlamConfig, mapctx: MapContext, name: str = "robot0"):
        self.cfg = cfg
        self.name = name
        self.mapctx = mapctx
        self.state = TrackingState.NO_IMAGES_YET
        self.frames: list[FrameRecord] = []
        self.K = jnp.asarray(cfg.camera.K())
        if cfg.orb.init_features:
            # explicit init budget — may exceed the map's per-frame feature
            # capacity; _try_initialize truncates back to max_keypoints
            n2 = cfg.orb.init_features
            cap2 = max(cfg.orb.max_keypoints, _pow2_at_least(n2))
        else:
            n2 = min(2 * cfg.orb.n_features, cfg.orb.max_keypoints)
            cap2 = cfg.orb.max_keypoints
        self.extract = orb_ops.make_extractor(cfg.orb, cfg.camera)
        self.extract_init = orb_ops.make_extractor(
            cfg.orb, cfg.camera, n_features=n2, max_keypoints=cap2
        )
        self._key = jax.random.key(zlib.crc32(name.encode()))
        self._reset_tracking()
        self.frame_id = -1
        self.on_keyframe = None  # callback(tracker, slot) — MultiMapper hook
        # set by MultiMapper.set_multi_mapping(False): loss relocalizes even
        # though a MultiMapper owns this tracker (runtime toggle analog of
        # Tracking::InformMultiMapping)
        self.reloc_on_loss = False
        # True while a chunk-finish event loop runs: tells the MultiMapper
        # hook to only ENQUEUE merge scans (the pump runs once per chunk)
        self._in_chunk_finish = False
        # localization-only mode: track against the frozen map, never insert
        # keyframes; on loss, relocalize (reference
        # System::ActivateLocalizationMode, Tracking::mbOnlyTracking)
        self.localization_only = False
        # early-loss reset (Tracking::Reset on loss with a young map,
        # Tracking.cc:520-528): a marginal two-view init that cannot be
        # tracked is thrown away and initialization restarts. MultiMapper
        # disables this — it owns loss handling (new-map-on-loss).
        self.auto_reset_young = True
        self.use_fused = True  # single-dispatch fused frame step (models/fused.py)
        # defer_sync pipelines the per-frame host sync one frame behind the
        # dispatch (streaming mode): hides the host<->device round trip at
        # the cost of keyframe events and records lagging one frame
        self.defer_sync = False
        self._pending = None
        self._frame_step = fused.make_frame_step(cfg, self.extract, self.K)
        self._ts = None  # device TrackState when the fused path is active
        # chunked streaming: N frames per dispatch, ONE host sync per chunk
        # (amortizes the host<->device round trip N-fold; see
        # fused.make_chunk_step). Built lazily on first use; rebuilt once
        # when the vocabulary appears (the with_bow program folds the BoW
        # database update + loop-candidate scan into the chunk).
        self.chunk_size = 8
        self._chunk_step = None
        self._chunk_bow = False

    def _reset_tracking(self):
        # generation counter: any host-side reset/switch invalidates chunks
        # dispatched earlier (see _finish_chunk's stale guard)
        self._gen = getattr(self, "_gen", 0) + 1
        self._ref = None
        self._ref_meta = (0, 0.0)
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_feats = None
        self.last_lm = None
        self.last_T = jnp.eye(4)
        self.frames_since_kf = 0
        self.last_kf_inliers = 0
        self.peak_inliers_since_kf = 0
        self.prev_inliers = 0  # collapse-gate reference (0 disables the gate)
        self._last_ref = (-1, None)  # (ref_slot, T_rel) of the latest frame

    def switch_map(self, mapctx: MapContext):
        """ORBSLAMM SwitchMap: point the tracker at a (new or merged) map."""
        self.mapctx = mapctx
        self.state = TrackingState.NOT_INITIALIZED
        self._reset_tracking()
        self._ts = None

    def _maybe_reset_young_map(self):
        """Early-loss reset (Tracking.cc:520-528): discard a young map that
        lost tracking right after initialization and re-initialize."""
        if (
            self.state == TrackingState.LOST
            and self.auto_reset_young
            and not self.localization_only
            and self.mapctx.n_kf < self.cfg.tracking.min_kfs_for_new_map
        ):
            mc = self.mapctx
            mc.map = ms.empty_map(self.cfg)
            mc.n_kf = 0
            if mc.kf_bow is not None:
                mc.kf_bow = jnp.zeros_like(mc.kf_bow)
            get_tracer().event("early_loss_reset", map_id=mc.map_id,
                               robot=self.name)
            mc.renew_id()
            self.switch_map(mc)

    def _sync_from_ts(self):
        """Copy the device TrackState back into the host-path fields before
        a host-side mutation (merge adoption, relocalization, ...)."""
        if self._ts is None:
            return
        t = self._ts
        self.T_cw = t.T_cw
        self.velocity = t.velocity
        self.last_T = t.last_T
        self.last_feats = t.last_feats
        self.last_lm = t.last_lm
        self.frames_since_kf = int(t.frames_since_kf)
        self.peak_inliers_since_kf = int(t.peak_inliers)
        self.prev_inliers = int(t.prev_inliers)
        self._ts = None

    def _empty_feats(self) -> Features:
        """Structural stand-in when no frame has been tracked yet (all
        invalid): bank TrackStates must keep a uniform pytree structure."""
        M = self.cfg.orb.max_keypoints
        stereoish = self.cfg.sensor != "mono"
        return Features(
            xy=jnp.zeros((M, 2), jnp.float32),
            xy_raw=jnp.zeros((M, 2), jnp.float32),
            angle=jnp.zeros((M,), jnp.float32),
            response=jnp.zeros((M,), jnp.float32),
            level=jnp.zeros((M,), jnp.int32),
            desc=jnp.zeros((M, 32), jnp.uint8),
            valid=jnp.zeros((M,), bool),
            u_right=jnp.full((M,), -1.0, jnp.float32) if stereoish else None,
            depth=jnp.full((M,), -1.0, jnp.float32) if stereoish else None,
        )

    def _make_ts(self) -> fused.TrackState:
        if self.last_feats is None:
            self.last_feats = self._empty_feats()
            self.last_lm = jnp.full(
                (self.cfg.orb.max_keypoints,), -1, jnp.int32
            )
        return fused.TrackState(
            T_cw=self.T_cw,
            velocity=self.velocity,
            last_T=self.last_T,
            last_feats=self.last_feats,
            last_lm=self.last_lm,
            frames_since_kf=jnp.int32(self.frames_since_kf),
            peak_inliers=jnp.int32(self.peak_inliers_since_kf),
            prev_inliers=jnp.int32(self.prev_inliers),
            n_kf=jnp.int32(self.mapctx.n_kf),
            # explicit array (not the None default): bank slices must keep a
            # stable pytree structure across reset_stream re-adoption
            lost=jnp.asarray(False),
            # carried observation indicator: rebuilt ONLY here (host events —
            # init, reloc, loop correction, merge); the fused chunk maintains
            # it incrementally across keyframe inserts
            obs_ind=ms.lm_indicator(self.mapctx.map),
            last_kf_T=self.mapctx.map.kf_pose[
                jnp.maximum(jnp.int32(self.mapctx.n_kf) - 1, 0)
            ],
        )

    def adopt_merged_map(self, mapctx: MapContext, S_new_from_old: jax.Array, lm_remap):
        """After this robot's map was merged into ``mapctx``: keep tracking,
        with pose/associations transformed into the merged frame."""
        self._sync_from_ts()
        self.mapctx = mapctx
        S = geo.sim3_compose(geo.sim3_from_se3(self.T_cw), geo.sim3_inv(S_new_from_old))
        self.T_cw = geo.sim3_to_se3(S)
        self.last_T = self.T_cw
        self.velocity = jnp.eye(4)
        if self.last_lm is not None:
            safe = jnp.maximum(self.last_lm, 0)
            self.last_lm = jnp.where(self.last_lm >= 0, lm_remap[safe], -1)

    # -- initialization ----------------------------------------------------
    def _try_initialize(self, feats: Features, timestamp: float):
        cfg = self.cfg
        if self._ref is None:
            self._ref = feats
            self._ref_meta = (self.frame_id, timestamp)
            return
        res = trk.match_for_init(cfg, self._ref, feats)
        n = int(res.ok.sum())
        if n < cfg.tracking.min_matches_init:
            # drop the reference only when matching has clearly broken down —
            # momentary dips must not reset the parallax accumulation
            if n < int(0.6 * cfg.tracking.min_matches_init):
                self._ref = feats
                self._ref_meta = (self.frame_id, timestamp)
            return
        import math

        xy_cur = jnp.take(feats.xy, res.idx, axis=0)
        init = None
        # borderline two-view problems are RANSAC-draw sensitive: a second
        # independent draw roughly squares the per-frame failure probability
        for _attempt in range(2):
            self._key, sub = jax.random.split(self._key)
            init = ransac.two_view_init(
                self._ref.xy, xy_cur, res.ok, self.K, sub, n_hyp=512, sigma=1.5,
                min_inliers=cfg.tracking.init_min_triangulated,
                median_parallax_cos=math.cos(
                    math.radians(cfg.tracking.init_min_parallax_deg)
                ),
            )
            if bool(init.success):
                break
        if not bool(init.success):
            return
        mc = self.mapctx
        ref_f, cur_f, match_idx = self._ref, feats, res.idx
        M_map = cfg.orb.max_keypoints
        if int(ref_f.valid.shape[0]) > M_map:
            # oversized init extraction: keep all inliers + best-response
            # fill, back at the map's per-frame feature capacity
            ref_f, cur_f, match_idx, pts2, inl2 = _truncate_init(
                ref_f, cur_f, match_idx, init.points1, init.inliers, M_map
            )
            init = init._replace(points1=pts2, inliers=inl2)
            feats = cur_f
        mc.map = _create_initial_map(
            cfg, mc.map, ref_f, cur_f, match_idx, init, self.K,
            self._ref_meta[0], self.frame_id, self._ref_meta[1], timestamp,
        )
        mc.n_kf = 2
        mc.map = lm_stage.local_bundle_adjustment(cfg, mc.map, jnp.int32(1), window=2, iters=20)
        self.T_cw = mc.map.kf_pose[1]
        self.last_T = self.T_cw
        self.velocity = jnp.eye(4)
        self.last_feats = feats
        self.last_lm = mc.map.kf_obs_lm[1]
        self.last_kf_inliers = int(init.n_inliers)
        self.peak_inliers_since_kf = int(init.n_inliers)
        self.prev_inliers = 0
        self.state = TrackingState.OK
        self.frames_since_kf = 0
        self._last_ref = (1, np.eye(4))  # this frame IS keyframe 1
        for s in (0, 1):
            self.mapctx.update_bow_row(s)

    def _try_initialize_depth(self, feats: Features, timestamp: float):
        """Stereo/RGB-D bootstrap: ONE keyframe, landmarks unprojected from
        depth (reference Tracking::StereoInitialization) — no two-view init,
        metric scale from the sensor."""
        cfg = self.cfg
        n_depth = int(jnp.sum(feats.valid & (feats.depth > 0)))
        if n_depth < cfg.tracking.min_matches_init:
            return
        mc = self.mapctx
        Mfeat = feats.valid.shape[0]
        no_obs = jnp.full((Mfeat,), -1, jnp.int32)
        mc.map = ms.insert_keyframe(
            mc.map, jnp.int32(0), jnp.eye(4), self.K, feats, no_obs,
            self.frame_id, timestamp, fixed=True,
        )
        mc.map = lm_stage.create_depth_landmarks(
            cfg, mc.map, jnp.int32(0), feats.depth,
            max_new=min(Mfeat, cfg.capacity.max_landmarks), close_only=False,
        )
        mc.n_kf = 1
        self.T_cw = jnp.eye(4)
        self.last_T = self.T_cw
        self.velocity = jnp.eye(4)
        self.last_feats = feats
        self.last_lm = mc.map.kf_obs_lm[0]
        self.last_kf_inliers = n_depth
        self.peak_inliers_since_kf = n_depth
        self.prev_inliers = 0
        self.state = TrackingState.OK
        self.frames_since_kf = 0
        self._last_ref = (0, np.eye(4))  # this frame IS keyframe 0
        mc.update_bow_row(0)

    # -- stereo / RGB-D public API (System::TrackStereo / TrackRGBD) -------
    def process_frame_stereo(self, image_left, image_right, timestamp: float):
        from orbslamm_tpu.ops import stereo as st

        imgL = jnp.asarray(image_left)
        imgR = jnp.asarray(image_right)
        featsR = self.extract(imgR)
        return self._process_depth_frame(
            imgL, timestamp,
            lambda f: st.with_stereo(f, featsR, self.cfg.camera,
                                     self.cfg.orb.scale_factor,
                                     img_left=imgL, img_right=imgR),
        )

    def process_frame_rgbd(self, image, depth_image, timestamp: float):
        from orbslamm_tpu.ops import stereo as st

        depth_image = jnp.asarray(depth_image)
        return self._process_depth_frame(
            jnp.asarray(image), timestamp,
            lambda f: st.with_depthmap(f, depth_image, self.cfg.camera),
        )

    def _process_depth_frame(self, img, timestamp: float, attach_depth):
        """Shared stereo/RGB-D state machine (host tracking path)."""
        self.frame_id += 1
        n_inl = 0
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            feats = attach_depth(self.extract(img))
            self.state = TrackingState.NOT_INITIALIZED
            if self.localization_only and self.mapctx.n_kf >= 1:
                n_inl = self._try_relocalize(feats)
            else:
                self._try_initialize_depth(feats, timestamp)
        elif self.state == TrackingState.OK:
            feats = attach_depth(self.extract(img))
            n_inl = self._track(feats, timestamp)
            if n_inl < self.cfg.tracking.min_inliers_local_map:
                self.state = TrackingState.LOST
                self._maybe_reset_young_map()
        elif self.state == TrackingState.LOST and (
            not self.cfg.multi_mapping or self.localization_only
            or self.on_keyframe is None or self.reloc_on_loss
        ):
            # relocalize when loss handling is unowned: multi-mapping's
            # new-map-on-loss belongs to a MultiMapper (which installs the
            # on_keyframe hook); a standalone System falls back to the
            # reference's Relocalization path (Tracking.cc:1404)
            feats = attach_depth(self.extract(img))
            n_inl = self._try_relocalize(feats)
        ok_now = self.state == TrackingState.OK
        rec = FrameRecord(
            frame_id=self.frame_id,
            timestamp=timestamp,
            T_cw=np.asarray(self.T_cw),
            state=self.state.name,
            n_inliers=n_inl,
            map_id=self.mapctx.map_id,
            ref_slot=self._last_ref[0] if ok_now else -1,
            T_rel=self._last_ref[1] if ok_now else None,
        )
        self.frames.append(rec)
        return rec

    # -- tracking ----------------------------------------------------------
    def _track(self, feats: Features, timestamp: float) -> int:
        cfg = self.cfg
        mc = self.mapctx
        T_pred = self.velocity @ self.last_T
        r1 = trk.track_motion_model(
            cfg, mc.map, feats, T_pred, self.K, self.last_feats, self.last_lm,
            T_last=self.last_T,
        )
        n1 = int(r1.n_inliers)
        T = r1.T_cw
        feat_lm = r1.feat_lm
        if n1 < cfg.tracking.min_inliers_track:
            T = self.last_T
            feat_lm = jnp.full_like(r1.feat_lm, -1)
        r2, mc.map = trk.track_local_map(cfg, mc.map, feats, T, self.K, feat_lm)
        n2 = int(r2.n_inliers)
        if (
            n2 < cfg.tracking.min_inliers_local_map
            or n2 < cfg.tracking.min_track_inlier_ratio * int(r2.n_matches)
            or n2 < 0.25 * self.prev_inliers
        ):
            return 0 if n2 >= cfg.tracking.min_inliers_local_map else n2
        self.prev_inliers = n2
        self.T_cw = r2.T_cw
        self.velocity = self.T_cw @ geo.T_inv(self.last_T)
        self.last_T = self.T_cw
        self.last_feats = feats
        self.last_lm = r2.feat_lm
        self.frames_since_kf += 1

        # keyframe decision: reference NeedNewKeyFrame with the PEAK inlier
        # count since last KF as the tracked-reference baseline
        self.peak_inliers_since_kf = max(self.peak_inliers_since_kf, n2)
        need = self.frames_since_kf >= cfg.tracking.new_kf_max_frames or (
            self.frames_since_kf >= 1
            and n2 > 15
            and n2 < cfg.tracking.new_kf_tracked_ratio * self.peak_inliers_since_kf
        )
        if need and not self.localization_only and mc.n_kf < cfg.capacity.max_keyframes - 1:
            slot = mc.insert_keyframe(
                self.T_cw, self.K, feats, r2.feat_lm, self.frame_id, timestamp
            )
            self._last_ref = (slot, np.eye(4))
            self.last_kf_inliers = n2
            self.peak_inliers_since_kf = n2
            self.frames_since_kf = 0
            mc.update_bow_row(slot)
            self._key, sub = jax.random.split(self._key)
            if mc.try_close_loop(slot, sub):
                self.T_cw = mc.map.kf_pose[slot]
                self.last_T = self.T_cw
                self.velocity = jnp.eye(4)
            if self.on_keyframe is not None:
                self.on_keyframe(self, slot)
        else:
            ref = self.mapctx.n_kf - 1
            self._last_ref = (
                ref,
                np.asarray(self.T_cw @ geo.T_inv(self.mapctx.map.kf_pose[ref])),
            )
        return n2

    def _try_relocalize(self, feats: Features) -> int:
        """Relocalization with the KFDB-rigor candidate treatment
        (KeyFrameDatabase::DetectRelocalizationCandidates,
        KeyFrameDatabase.cc:202-312): covisibility-group score accumulation
        with 0.75x-of-best retention, geometric (PnP) verification of each
        group's best individual keyframe, then projection refinement
        against the local map before accepting (Tracking.cc:1404-1560)."""
        self._sync_from_ts()
        cfg = self.cfg
        mc = self.mapctx
        if mc.voc is None or mc.kf_bow is None:
            return 0
        words = bow.assign_words(mc.voc, feats.desc, feats.valid)
        v = bow.bow_vector(mc.voc, words)
        scores = np.asarray(
            lc_stage.relocalization_candidates(cfg, mc.map, mc.kf_bow, v)
        )
        if float(scores.max()) <= 0.01:
            return 0
        acc_d, nb_d = lc_stage.candidate_groups(
            cfg, mc.map, jnp.asarray(np.where(scores > 0.01, scores, -1.0))
        )
        acc = np.asarray(acc_d)
        nb = np.asarray(nb_d)
        masked = acc.copy()
        for _ in range(cfg.loop.top_k_candidates):
            rep = int(masked.argmax())
            if masked[rep] <= 0:
                break
            cand = int(np.argmax(np.where(nb[rep], scores, -1.0)))
            masked[nb[rep]] = -1.0
            self._key, sub = jax.random.split(self._key)
            ok, T, feat_lm, n = lc_stage.relocalize_against_kf(
                cfg, mc.map, feats, self.K, jnp.int32(cand), sub
            )
            if not bool(ok):
                continue
            # projection refinement: harvest more map associations from the
            # PnP pose and re-optimize (SearchByProjection + final
            # PoseOptimization, Tracking.cc:1500-1553)
            r2, mc.map = trk.track_local_map(cfg, mc.map, feats, T, self.K,
                                             feat_lm)
            if int(r2.n_inliers) < cfg.tracking.min_inliers_local_map:
                continue
            self.T_cw = r2.T_cw
            self.last_T = r2.T_cw
            self.velocity = jnp.eye(4)
            self.last_feats = feats
            self.last_lm = r2.feat_lm
            self.state = TrackingState.OK
            self.frames_since_kf = 0
            self.peak_inliers_since_kf = int(r2.n_inliers)
            self.prev_inliers = 0
            ref = mc.n_kf - 1
            self._last_ref = (
                ref,
                np.asarray(self.T_cw @ geo.T_inv(mc.map.kf_pose[ref])),
            )
            return int(r2.n_inliers)
        return 0

    def _track_fused(self, img, timestamp: float) -> int:
        mc = self.mapctx
        if self._ts is None:
            self._ts = self._make_ts()
        m, ts_next, summary = self._frame_step(
            mc.map, self._ts, img, jnp.int32(self.frame_id), jnp.float32(timestamp),
            jnp.asarray(not self.localization_only),
        )
        mc.map = m
        self._ts = ts_next
        if self.defer_sync:
            prev, self._pending = self._pending, summary
            if prev is None:
                return self.cfg.tracking.min_inliers_local_map  # warmup frame
            s = jax.device_get(prev)
        else:
            s = jax.device_get(summary)  # the single host sync of the frame
        n_inl = int(s.n_inliers)
        self.T_cw = jnp.asarray(s.T_cw)
        if not bool(s.tracking_ok):
            self._last_ref = (-1, None)
            self._sync_from_ts()
            return 0  # signal tracking failure regardless of raw inlier count
        self._last_ref = (int(s.ref_slot), np.asarray(s.T_rel))
        if bool(s.new_kf):
            slot = int(s.kf_slot)
            mc.n_kf = slot + 1
            tr = get_tracer()
            tr.incr("keyframes_inserted")
            tr.event("keyframe", map_id=mc.map_id, slot=slot,
                     frame_id=self.frame_id, ts=float(timestamp))
            mc.update_bow_row(slot)
            self._key, sub = jax.random.split(self._key)
            if mc.try_close_loop(slot, sub):
                # loop correction moved the map — restart motion model there
                self._sync_from_ts()
                self.T_cw = mc.map.kf_pose[slot]
                self.last_T = self.T_cw
                self.velocity = jnp.eye(4)
            if self.on_keyframe is not None:
                self.on_keyframe(self, slot)
            mc.gba_slice()
        return n_inl

    # -- chunked streaming path ---------------------------------------------
    def process_frames(self, images, timestamps) -> list[FrameRecord]:
        """Process a batch of frames through the PIPELINED chunk path.

        While tracking is OK, chunk k+1 is dispatched BEFORE chunk k's
        summaries are fetched: the device queue always holds work, so the
        host→device round trip, the summary fetch, and all keyframe-rate
        host work overlap with device compute (the reference gets the same
        overlap from its free-running LocalMapping/LoopClosing threads).
        Keyframe events are thus handled one chunk late — identical delay
        semantics to the reference's keyframe queues. Initialization / loss
        frames fall back to the per-frame path."""
        recs: list[FrameRecord] = []
        pending = None
        i, n = 0, len(timestamps)
        while i < n:
            cs = self.chunk_size
            if self.state == TrackingState.OK and self.use_fused and n - i >= cs:
                tok = self._dispatch_chunk(images[i : i + cs],
                                           timestamps[i : i + cs])
                i += cs
                if pending is not None:
                    recs.extend(self._finish_chunk(pending))
                pending = tok
            else:
                if pending is not None:
                    recs.extend(self._finish_chunk(pending))
                    pending = None
                    continue  # state may have changed — re-evaluate
                recs.append(self.process_frame(images[i], float(timestamps[i])))
                i += 1
        if pending is not None:
            recs.extend(self._finish_chunk(pending))
        return recs

    def _process_chunk(self, images, timestamps) -> list[FrameRecord]:
        """Unpipelined convenience: dispatch one chunk and handle it."""
        return self._finish_chunk(self._dispatch_chunk(images, timestamps))

    def _dispatch_chunk(self, images, timestamps) -> dict:
        """Issue one chunk dispatch (no host sync). Returns a token for
        ``_finish_chunk``. Lazily trains the vocabulary once enough
        keyframes exist (the host knows n_kf one chunk late — harmless)."""
        mc = self.mapctx
        if (mc.loop_closing_enabled and not self.localization_only
                and mc.voc is None and mc.n_kf >= 4):
            mc.ensure_vocabulary()
        cs = len(timestamps)
        want_bow = mc.voc is not None and mc.kf_bow is not None
        if self._chunk_step is None or self._chunk_bow != want_bow:
            self._chunk_step = fused.make_chunk_step(
                self.cfg, self.extract, self.K, with_bow=want_bow
            )
            self._chunk_bow = want_bow
        if self._ts is None:
            self._ts = self._make_ts()
        if isinstance(images, (list, tuple)):
            imgs = jnp.stack([jnp.asarray(im) for im in images])
        else:
            imgs = jnp.asarray(images)
        fids = jnp.arange(self.frame_id + 1, self.frame_id + 1 + cs, dtype=jnp.int32)
        stamps = jnp.asarray(np.asarray(timestamps, np.float32))
        kf_bow_in = mc.kf_bow if want_bow else jnp.zeros((), jnp.float32)
        m, ts, kf_bow_out, summaries = self._chunk_step(
            mc.map, self._ts, kf_bow_in, mc.voc if want_bow else None,
            imgs, fids, stamps, jnp.asarray(not self.localization_only),
        )
        mc.map = m
        self._ts = ts
        if want_bow:
            mc.kf_bow = kf_bow_out
        fid0 = self.frame_id + 1
        self.frame_id += cs
        return {
            "mc": mc,
            "summaries": summaries,
            "timestamps": [float(t) for t in timestamps],
            "fid0": fid0,
            "want_bow": want_bow,
            "gen": self._gen,
        }

    def _finish_chunk(self, token: dict) -> list[FrameRecord]:
        """Fetch a dispatched chunk's summaries and run the keyframe-rate
        host events (records, loop closing, merge scan)."""
        mc: MapContext = token["mc"]
        timestamps = token["timestamps"]
        cs = len(timestamps)
        s = jax.device_get(token["summaries"])  # the chunk's single host sync
        # a chunk dispatched before a loss/merge/reset was handled is STALE:
        # its frames ran with the latched `lost` flag (frozen state, no
        # keyframes) — emit its records but leave the tracker's new state
        # machine alone
        stale = token["gen"] != self._gen or self.mapctx is not mc

        tr = get_tracer()
        recs: list[FrameRecord] = []
        new_kfs: list[tuple[int, np.ndarray, int]] = []  # (slot, pose, j)
        # pass 1: records + keyframe bookkeeping — the map must know ALL of
        # the chunk's keyframes before loop closing / merging fire, exactly
        # like the reference's KF queue draining ahead of
        # LoopClosing/MultiMapper consumption
        last_T = np.asarray(self.T_cw)
        for j in range(cs):
            fid = token["fid0"] + j
            ok = bool(s.tracking_ok[j])
            n_inl = int(s.n_inliers[j]) if ok else 0
            if ok:
                last_T = np.asarray(s.T_cw[j])
                if not stale:
                    self.T_cw = last_T
                if bool(s.new_kf[j]):
                    slot = int(s.kf_slot[j])
                    mc.n_kf = max(mc.n_kf, slot + 1)
                    tr.incr("keyframes_inserted")
                    tr.event("keyframe", map_id=mc.map_id, slot=slot,
                             frame_id=fid, ts=float(timestamps[j]))
                    new_kfs.append((slot, np.asarray(s.T_cw[j]), j))
            elif not stale:
                self.state = TrackingState.LOST
            rec = FrameRecord(
                frame_id=fid,
                timestamp=float(timestamps[j]),
                T_cw=last_T,
                state=("OK" if ok else "LOST") if stale else self.state.name,
                n_inliers=n_inl,
                map_id=mc.map_id,
                ref_slot=int(s.ref_slot[j]) if ok else -1,
                T_rel=np.asarray(s.T_rel[j]) if ok else None,
            )
            self.frames.append(rec)
            recs.append(rec)
        if stale:
            # no keyframe-rate events on a superseded map/state
            return recs
        self._maybe_reset_young_map()
        if token["want_bow"]:
            # BoW rows + candidate scores were computed INSIDE the chunk
            loop_pre = {
                slot: (np.asarray(s.loop_scores[j]), float(s.loop_min_score[j]))
                for slot, _, j in new_kfs
            }
        else:
            # vocabulary appeared after this dispatch (or is still absent):
            # host fallback, one dispatch for rows + one scan fetch
            mc.update_bow_rows([slot for slot, _, _ in new_kfs])
            loop_pre = mc.loop_scan([slot for slot, _, _ in new_kfs])
        # pass 2: keyframe-rate events (loop closing, cross-map merging)
        loop_rebase = None
        self._in_chunk_finish = True
        for slot, T_at_insert, _j in new_kfs:
            self._key, sub = jax.random.split(self._key)
            pose_before = mc.map.kf_pose[slot]  # lazy device ref, pre-correction
            if mc.try_close_loop(slot, sub, precomputed=loop_pre.get(slot)):
                loop_rebase = (np.asarray(pose_before),
                               np.asarray(mc.map.kf_pose[slot]))
            if self.on_keyframe is not None:
                self.on_keyframe(self, slot)
                if self.mapctx is not mc:
                    # merged into another map mid-walk: adopt_merged_map has
                    # already rebased the host state; remaining keyframes of
                    # the chunk are in the merged map and will be scanned on
                    # their next keyframes
                    self._in_chunk_finish = False
                    return recs
        self._in_chunk_finish = False
        if loop_rebase is not None and self._ts is not None:
            # loop correction moved the map under the camera: rebase the
            # device TrackState through the corrected keyframe (the
            # reference's Tcr reference-chain trick, System.cc:470-499)
            T_old, T_new = loop_rebase
            self._ts = fused.rebase_track_state(
                self._ts, jnp.asarray(T_old), jnp.asarray(T_new)
            )
            # correct_loop fused landmarks → the carried indicator is stale
            self._ts = self._ts._replace(obs_ind=ms.lm_indicator(mc.map))
            self.T_cw = np.asarray(self.T_cw @ np.linalg.inv(T_old) @ T_new)
        # overlapped global BA: one slice per chunk boundary while scheduled
        mc.gba_slice()
        return recs

    # -- public API --------------------------------------------------------
    def process_frame(self, image: np.ndarray, timestamp: float) -> FrameRecord:
        mc = self.mapctx
        if (mc.loop_closing_enabled and not self.localization_only
                and mc.voc is None and mc.n_kf >= 4):
            mc.ensure_vocabulary()
        self.frame_id += 1
        img = jnp.asarray(image)
        n_inl = 0
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            if self.localization_only and self.mapctx.n_kf >= 2:
                # localization mode on a pre-built (e.g. loaded) map: skip
                # two-view init, localize straight against the KF database
                feats = self.extract(img)
                self.state = TrackingState.NOT_INITIALIZED
                n_inl = self._try_relocalize(feats)
            else:
                feats = self.extract_init(img)
                self.state = TrackingState.NOT_INITIALIZED
                self._try_initialize(feats, timestamp)
        elif self.state == TrackingState.OK and self.use_fused:
            n_inl = self._track_fused(img, timestamp)
            if n_inl < self.cfg.tracking.min_inliers_local_map:
                self.state = TrackingState.LOST
                self._maybe_reset_young_map()
        elif self.state == TrackingState.OK:
            feats = self.extract(img)
            n_inl = self._track(feats, timestamp)
            if n_inl < self.cfg.tracking.min_inliers_local_map:
                self.state = TrackingState.LOST
                self._maybe_reset_young_map()
        elif self.state == TrackingState.LOST and (
            not self.cfg.multi_mapping or self.localization_only
            or self.on_keyframe is None or self.reloc_on_loss
        ):
            # single-map / localization mode — or no MultiMapper installed
            # (on_keyframe unset): relocalize against the keyframe database
            # (Tracking::Relocalization — with multi-mapping ON the owner
            # spawns a new map instead, Tracking.cc:330-366)
            feats = self.extract(img)
            n_inl = self._try_relocalize(feats)
        ok_now = self.state == TrackingState.OK
        rec = FrameRecord(
            frame_id=self.frame_id,
            timestamp=timestamp,
            T_cw=np.asarray(self.T_cw),
            state=self.state.name,
            n_inliers=n_inl,
            map_id=self.mapctx.map_id,
            ref_slot=self._last_ref[0] if ok_now else -1,
            T_rel=self._last_ref[1] if ok_now else None,
        )
        self.frames.append(rec)
        return rec


@dataclass
class MonocularSession:
    """Single-robot single-map facade (System analog). Kept API-compatible
    with earlier milestones; multi-map behavior lives in models/multimap.py."""

    cfg: SlamConfig
    name: str = "robot0"

    def __post_init__(self):
        self.mapctx = MapContext(self.cfg)
        self.tracker = RobotTracker(self.cfg, self.mapctx, self.name)

    @property
    def enable_loop_closing(self) -> bool:
        return self.tracker.mapctx.loop_closing_enabled

    @enable_loop_closing.setter
    def enable_loop_closing(self, on: bool):
        # a runtime toggle, not a monkeypatch: try_close_loop checks the
        # flag, and lazy vocabulary training is gated on it too
        self.tracker.mapctx.loop_closing_enabled = bool(on)

    # -- passthroughs ------------------------------------------------------
    @property
    def map(self):
        return self.tracker.mapctx.map

    @property
    def n_kf(self):
        return self.tracker.mapctx.n_kf

    @property
    def state(self):
        return self.tracker.state

    @property
    def frames(self):
        return self.tracker.frames

    @property
    def loops_closed(self):
        return self.tracker.mapctx.loops_closed

    @property
    def T_cw(self):
        return self.tracker.T_cw

    def activate_localization_mode(self):
        """Freeze the map; track + relocalize only (System.cc:375
        ActivateLocalizationMode / Tracking::InformOnlyTracking)."""
        self.tracker._sync_from_ts()
        self.tracker.mapctx.ensure_vocabulary()  # reloc needs the KF database
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def process_frame(self, image, timestamp):
        return self.tracker.process_frame(image, timestamp)

    def process_frames(self, images, timestamps):
        """Pipelined chunked streaming (see RobotTracker.process_frames)."""
        return self.tracker.process_frames(images, timestamps)

    def keyframe_trajectory(self):
        m = self.map
        valid = np.asarray(m.kf_valid)
        poses = np.asarray(m.kf_pose)[valid]
        stamps = np.asarray(m.kf_timestamp)[valid]
        order = np.argsort(np.asarray(m.kf_frame_id)[valid])
        return stamps[order], poses[order]

    def frame_trajectory(self):
        """OK-frame trajectory with export-time pose recovery through
        reference keyframes (System.cc:470-499): frames recorded before a
        loop closure / GBA ride the corrected keyframe poses."""
        ok = [f for f in self.frames if f.state == "OK"]
        stamps = np.array([f.timestamp for f in ok])
        poses = (
            np.stack(resolve_frame_poses(ok))
            if stamps.size
            else np.zeros((0, 4, 4))
        )
        return stamps, poses

    def summary(self) -> dict:
        s = self.tracker.mapctx.summary()
        s["state"] = self.tracker.state.name
        s["frames"] = len(self.frames)
        return s


@dataclass
class StereoSession(MonocularSession):
    """Rectified-stereo facade (System::TrackStereo analog): metric scale
    from the baseline, one-keyframe bootstrap, depth-spawned close points."""

    def __post_init__(self):
        if self.cfg.camera.bf <= 0:
            raise ValueError("StereoSession needs camera.bf > 0")
        self.cfg = self.cfg.replace(sensor="stereo")
        super().__post_init__()

    def process_frame(self, image_left, image_right, timestamp):
        return self.tracker.process_frame_stereo(image_left, image_right, timestamp)


@dataclass
class RGBDSession(MonocularSession):
    """RGB-D facade (System::TrackRGBD analog): depth image registered to the
    RGB frame, virtual right coordinate u - bf/d (Frame::ComputeStereoFromRGBD)."""

    def __post_init__(self):
        if self.cfg.camera.bf <= 0:
            raise ValueError("RGBDSession needs camera.bf > 0")
        self.cfg = self.cfg.replace(sensor="rgbd")
        super().__post_init__()

    def process_frame(self, image, depth_image, timestamp):
        return self.tracker.process_frame_rgbd(image, depth_image, timestamp)
