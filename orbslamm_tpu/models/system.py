"""Host-driven SLAM session (the reference's System + Tracking state machine).

The reference runs tracking / local mapping / loop closing as free threads
with queues and usleep polling (SURVEY.md §2.3); here the host sequences
jitted stages per frame — mapping work happens synchronously on keyframe
insertion (stage scheduling replaces queue backpressure). The tracker state
machine mirrors Tracking.h:92 {NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST}.

Multi-map behavior (new map on loss, ORBSLAMM's signature —
Tracking.cc:330-366) lives in models/multimap.py; this module manages ONE
map and reports LOST to its owner.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models import loop_closing as lc_stage
from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models import tracking as trk
from orbslamm_tpu.ops import bow, geometry as geo, orb as orb_ops, ransac
from orbslamm_tpu.ops.orb import Features
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
    # landmark attributes from the reference keyframe view
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
    # current keyframe: feature match_idx[i] observes landmark i
    obs_cur = jnp.full((Mfeat,), -1, jnp.int32)
    tgt = jnp.where(init.inliers, match_idx, Mfeat)
    obs_cur = obs_cur.at[tgt].set(jnp.where(init.inliers, slots, -1), mode="drop")
    m = ms.insert_keyframe(m, jnp.int32(1), T21, K, cur, obs_cur, frame_cur, ts_cur)
    return m


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    T_cw: np.ndarray
    state: str
    n_inliers: int


@dataclass
class MonocularSession:
    """One robot's SLAM session over one map (System + Tracking analog)."""

    cfg: SlamConfig
    name: str = "robot0"
    state: TrackingState = TrackingState.NO_IMAGES_YET
    frames: list = field(default_factory=list)

    def __post_init__(self):
        cfg = self.cfg
        self.K = jnp.asarray(cfg.camera.K())
        self.map = ms.empty_map(cfg)
        n2 = min(2 * cfg.orb.n_features, cfg.orb.max_keypoints)
        self.extract = orb_ops.make_extractor(cfg.orb, cfg.camera)
        self.extract_init = orb_ops.make_extractor(cfg.orb, cfg.camera, n_features=n2)
        self._key = jax.random.key(0)
        self._ref = None  # init reference Features
        self._ref_meta = (0, 0.0)
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_feats = None
        self.last_lm = None
        self.last_T = jnp.eye(4)
        self.frames_since_kf = 0
        self.last_kf_inliers = 0
        self.peak_inliers_since_kf = 0
        self.frame_id = -1
        self.n_kf = 0
        # place recognition / loop closing
        self.voc: bow.Vocabulary | None = None
        self.kf_bow = None  # [K_cap, n_words]
        self.last_loop_kf = -(10**9)
        self.loops_closed: list = []
        self.enable_loop_closing = True

    # -- keyframe insertion + mapping stages ------------------------------
    def _insert_keyframe(self, feats: Features, feat_lm, timestamp):
        slot = jnp.int32(self.n_kf)
        self.map = ms.insert_keyframe(
            self.map, slot, self.T_cw, self.K, feats, feat_lm, self.frame_id, timestamp
        )
        self.n_kf += 1
        self.map = lm_stage.triangulate_new_landmarks(self.cfg, self.map, slot)
        self.map = lm_stage.fuse_neighbors(self.cfg, self.map, slot)
        self.map = lm_stage.local_bundle_adjustment(self.cfg, self.map, slot)
        self.map = lm_stage.cull_landmarks(self.cfg, self.map, slot)
        self.frames_since_kf = 0
        if self.enable_loop_closing:
            self._update_bow(int(slot))
            self._try_close_loop(int(slot))

    # -- place recognition / loop closing ---------------------------------
    def _update_bow(self, slot: int):
        """Maintain the keyframe BoW database (KeyFrameDatabase::add analog).
        The vocabulary is trained online from the first keyframes' descriptors
        (the reference loads a pre-trained ORBvoc.txt instead)."""
        if self.voc is None:
            if self.n_kf < 4:
                return
            kv = np.asarray(self.map.kf_valid)
            descs = []
            for s in np.nonzero(kv)[0]:
                fv = np.asarray(self.map.kf_feat_valid[s])
                descs.append(np.asarray(self.map.kf_desc[s])[fv])
            train = np.concatenate(descs)
            self.voc = bow.build_vocabulary(train, branching=8, depth=3, iters=6)
            K_cap = self.map.kf_pose.shape[0]
            self.kf_bow = jnp.zeros((K_cap, self.voc.n_words), jnp.float32)
            for s in np.nonzero(kv)[0]:
                self._set_bow_row(int(s))
        else:
            self._set_bow_row(slot)

    def _set_bow_row(self, slot: int):
        words = bow.assign_words(
            self.voc, self.map.kf_desc[slot], self.map.kf_feat_valid[slot]
        )
        self.kf_bow = self.kf_bow.at[slot].set(bow.bow_vector(self.voc, words))

    def _try_close_loop(self, slot: int):
        cfg = self.cfg
        if (
            self.voc is None
            or self.n_kf < cfg.loop.min_kfs_for_merge
            or slot - self.last_loop_kf < cfg.loop.kfs_between_loops
        ):
            return
        scores, allowed, min_score = lc_stage.loop_candidates(
            cfg, self.map, self.kf_bow, jnp.int32(slot), min_gap=cfg.loop.kfs_between_loops
        )
        sc = np.asarray(jnp.where(allowed, scores, -1.0))
        cand = int(sc.argmax())
        floor = max(float(min_score), 0.015)
        if sc[cand] < floor:
            return
        self._key, sub = jax.random.split(self._key)
        ls = lc_stage.compute_loop_sim3(
            cfg, self.map, jnp.int32(slot), jnp.int32(cand), sub
        )
        if not bool(ls.success):
            return
        self.map = lc_stage.correct_loop(
            cfg, self.map, jnp.int32(slot), jnp.int32(cand), ls.S_ba
        )
        self.map = lc_stage.global_bundle_adjust(cfg, self.map, iters=8)
        # tracking state is stale after the correction
        self.T_cw = self.map.kf_pose[slot]
        self.last_T = self.T_cw
        self.velocity = jnp.eye(4)
        self.last_loop_kf = slot
        self.loops_closed.append((slot, cand, int(ls.n_inliers)))

    def _try_initialize(self, feats: Features, timestamp: float):
        cfg = self.cfg
        if self._ref is None:
            self._ref = feats
            self._ref_meta = (self.frame_id, timestamp)
            return
        res = trk.match_for_init(cfg, self._ref, feats)
        n = int(res.ok.sum())
        if n < cfg.tracking.min_matches_init:
            self._ref = feats  # too few matches → restart from this frame
            self._ref_meta = (self.frame_id, timestamp)
            return
        self._key, sub = jax.random.split(self._key)
        xy_cur = jnp.take(feats.xy, res.idx, axis=0)
        init = ransac.two_view_init(
            self._ref.xy, xy_cur, res.ok, self.K, sub, sigma=1.5
        )
        if not bool(init.success):
            return  # keep reference, wait for more parallax
        self.map = _create_initial_map(
            cfg, self.map, self._ref, feats, res.idx, init, self.K,
            self._ref_meta[0], self.frame_id, self._ref_meta[1], timestamp,
        )
        self.n_kf = 2
        # refine with a BA over the two views (Tracking.cc:736 GBA(20))
        self.map = lm_stage.local_bundle_adjustment(
            self.cfg, self.map, jnp.int32(1), window=2, iters=20
        )
        self.T_cw = self.map.kf_pose[1]
        self.last_T = self.T_cw
        self.velocity = jnp.eye(4)
        self.last_feats = feats
        # associations of the current frame = obs row of KF1
        self.last_lm = self.map.kf_obs_lm[1]
        self.last_kf_inliers = int(init.n_inliers)
        self.state = TrackingState.OK
        self.frames_since_kf = 0

    def _track(self, feats: Features, timestamp: float) -> int:
        cfg = self.cfg
        T_pred = self.velocity @ self.last_T
        r1 = trk.track_motion_model(
            cfg, self.map, feats, T_pred, self.K, self.last_feats, self.last_lm,
            T_last=self.last_T,
        )
        n1 = int(r1.n_inliers)
        T = r1.T_cw
        feat_lm = r1.feat_lm
        if n1 < cfg.tracking.min_inliers_track:
            # fallback: match straight against the map from the last pose
            T = self.last_T
            feat_lm = jnp.full_like(r1.feat_lm, -1)
        r2, self.map = trk.track_local_map(cfg, self.map, feats, T, self.K, feat_lm)
        n2 = int(r2.n_inliers)
        if n2 < cfg.tracking.min_inliers_local_map:
            return n2  # caller transitions to LOST
        self.T_cw = r2.T_cw
        self.velocity = self.T_cw @ geo.T_inv(self.last_T)
        self.last_T = self.T_cw
        self.last_feats = feats
        self.last_lm = r2.feat_lm
        self.frames_since_kf += 1

        # keyframe decision (NeedNewKeyFrame, Tracking.cc:1027). The tracked
        # reference count is the PEAK inlier count since the last keyframe —
        # the analog of the reference KF's TrackedMapPoints — so decay from a
        # healthy level triggers insertion even if the insertion-time count
        # was low.
        self.peak_inliers_since_kf = max(self.peak_inliers_since_kf, n2)
        need = self.frames_since_kf >= cfg.tracking.new_kf_max_frames or (
            self.frames_since_kf >= 1
            and n2 > 15
            and n2 < cfg.tracking.new_kf_tracked_ratio * self.peak_inliers_since_kf
        )
        if need and self.n_kf < cfg.capacity.max_keyframes - 1:
            self._insert_keyframe(feats, r2.feat_lm, timestamp)
            self.last_kf_inliers = n2
            self.peak_inliers_since_kf = n2
        return n2

    # -- public API -------------------------------------------------------
    def process_frame(self, image: np.ndarray, timestamp: float) -> FrameRecord:
        self.frame_id += 1
        img = jnp.asarray(image)
        n_inl = 0
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            feats = self.extract_init(img)
            self.state = TrackingState.NOT_INITIALIZED
            self._try_initialize(feats, timestamp)
        elif self.state == TrackingState.OK:
            feats = self.extract(img)
            n_inl = self._track(feats, timestamp)
            if n_inl < self.cfg.tracking.min_inliers_local_map:
                self.state = TrackingState.LOST
        rec = FrameRecord(
            frame_id=self.frame_id,
            timestamp=timestamp,
            T_cw=np.asarray(self.T_cw),
            state=self.state.name,
            n_inliers=n_inl,
        )
        self.frames.append(rec)
        return rec

    # -- outputs ----------------------------------------------------------
    def keyframe_trajectory(self):
        """(timestamps, T_cw [N,4,4]) of valid keyframes (the BA-refined
        poses — SaveKeyFrameTrajectoryTUM analog)."""
        valid = np.asarray(self.map.kf_valid)
        poses = np.asarray(self.map.kf_pose)[valid]
        stamps = np.asarray(self.map.kf_timestamp)[valid]
        order = np.argsort(np.asarray(self.map.kf_frame_id)[valid])
        return stamps[order], poses[order]

    def frame_trajectory(self):
        stamps = np.array([f.timestamp for f in self.frames if f.state == "OK"])
        poses = np.stack(
            [f.T_cw for f in self.frames if f.state == "OK"]
        ) if stamps.size else np.zeros((0, 4, 4))
        return stamps, poses

    def summary(self) -> dict:
        s = ms.as_numpy_summary(self.map)
        s["state"] = self.state.name
        s["frames"] = len(self.frames)
        return s
