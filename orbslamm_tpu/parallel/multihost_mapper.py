"""Cross-process MultiMapper coordination — the multi-host deployment of
§5.8 (SURVEY.md).

The reference's whole multi-robot coordination is ONE shared in-process
registry: every System holds a pointer to the same MultiMapper, which walks
all (Map, KFDB) pairs under mutexes (MultiMapper.h:123-130, wired at
src/MultiMapper.cc:925-946). Across hosts there is no shared memory, so the
registry becomes HOST-REPLICATED METADATA plus payload migration:

  * every process runs its own robots + MultiMapper (robot streams are
    host-parallel: zero cross-host traffic on the tracking hot path);
  * a ``HostMapperBridge`` periodically exchanges compact per-map BoW
    SIGNATURES (top-scoring words of representative keyframes) through one
    ``all_gather_bytes`` collective — the analog of the reference's
    registry scan (MultiMapper.cc:82-165), but over DCN;
  * when a remote signature scores against a local map's keyframe database,
    the owning process SHIPS the candidate map's arrays (a second
    collective round), and the receiving MultiMapper registers it like any
    local map — the normal deferred scan → Sim3-verify → merge pipeline
    (models/multimap.py) then performs the actual merge with full rigor;
  * the vocabulary is broadcast once from process 0 so BoW word ids agree
    across hosts (the reference loads the same ORBvoc.txt in every System).

``exchange()`` is a COLLECTIVE: every process must call it the same number
of times (drive it from a lockstep outer loop, e.g. once per chunk round —
the cadence analog of the MultiMapper thread's 5 ms poll).

Shipping policy: a map still actively tracked by a local robot is shipped
as a COPY (the robot keeps mapping locally; the receiver merges the copy —
one-way contribution, like a robot uploading to a central map server).
Orphan maps (kept after tracking loss, or whose robot finished) migrate
outright and are retired locally.
"""

from __future__ import annotations

import pickle
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.models.system import MapContext
from orbslamm_tpu.parallel import multihost as mh
from orbslamm_tpu.utils.trace import get_tracer


def _sparsify_rows(rows: np.ndarray, top_w: int):
    """[R, n_words] dense BoW rows -> (word_idx [R, top_w], weights) —
    compact signature payload (BoW vectors are naturally sparse)."""
    idx = np.argsort(rows, axis=1)[:, -top_w:].astype(np.int32)
    w = np.take_along_axis(rows, idx, axis=1).astype(np.float32)
    return idx, w


def _densify_rows(idx, w, n_words: int) -> np.ndarray:
    rows = np.zeros((idx.shape[0], n_words), np.float32)
    np.put_along_axis(rows, idx, w, axis=1)
    return rows


class HostMapperBridge:
    """Periodic cross-process map-signature exchange + payload migration."""

    def __init__(self, mm: MultiMapper, reps_per_map: int = 6,
                 top_words: int = 64, score_floor: float = 0.02,
                 payload_max: int = 1 << 23):
        self.mm = mm
        self.reps_per_map = reps_per_map
        self.top_words = top_words
        self.score_floor = score_floor
        self.payload_max = payload_max
        self.process_id = jax.process_index()
        self.n_proc = jax.process_count()
        # (proc, map_id) pairs already received — never import twice
        self._imported: set[tuple[int, int]] = set()
        # local ids of maps that came from another host — never announced
        # back (echo guard) and never re-shipped
        self._imported_local: set[int] = set()
        self._shipped: set[int] = set()
        self.transfers: list[dict] = []

    # -- signature construction -------------------------------------------
    def _local_signatures(self) -> list[dict]:
        sigs = []
        cfg = self.mm.cfg
        for mc in self.mm.live_maps():
            if mc.kf_bow is None or mc.n_kf < cfg.loop.min_kfs_for_merge:
                continue
            if mc.map_id in self._shipped or mc.map_id in self._imported_local:
                continue
            # newest reps_per_map keyframes as the map's signature (the
            # reference scans newest-first, MultiMapper.cc:124)
            slots = list(range(max(0, mc.n_kf - self.reps_per_map), mc.n_kf))
            rows = np.asarray(mc.kf_bow)[slots]
            idx, w = _sparsify_rows(rows, self.top_words)
            sigs.append({
                "map_id": mc.map_id,
                "n_kf": mc.n_kf,
                "slots": slots,
                "word_idx": idx,
                "word_w": w,
            })
        return sigs

    def _score_remote(self, sig: dict) -> float:
        """Best BoW score of a remote map signature against every local
        map's keyframe database (KeyFrameDatabase::DetectLoopCandidates
        across hosts)."""
        from orbslamm_tpu.ops import bow
        best = 0.0
        for mc in self.mm.live_maps():
            if mc.kf_bow is None or mc.n_kf < 2:
                continue
            rows = _densify_rows(sig["word_idx"], sig["word_w"],
                                 int(mc.kf_bow.shape[1]))
            for r in rows:
                s = np.asarray(bow.bow_score(jnp.asarray(r), mc.kf_bow))
                kv = np.asarray(self._kf_valid(mc))
                s = np.where(kv, s, -1.0)
                best = max(best, float(s.max()))
        return best

    @staticmethod
    def _kf_valid(mc: MapContext):
        return mc.map.kf_valid

    # -- payload (de)serialization ----------------------------------------
    def _pack_map(self, mc: MapContext) -> bytes:
        payload = {
            "map_id": mc.map_id,
            "n_kf": mc.n_kf,
            "map": jax.device_get(mc.map),
            "kf_bow": np.asarray(mc.kf_bow) if mc.kf_bow is not None else None,
        }
        return pickle.dumps(payload)

    def _unpack_map(self, blob: bytes, src_proc: int) -> MapContext | None:
        payload = pickle.loads(blob)
        key = (src_proc, payload["map_id"])
        if key in self._imported:
            return None
        self._imported.add(key)
        mc = MapContext(self.mm.cfg, voc=self.mm.voc)
        self._imported_local.add(mc.map_id)
        mc.map = jax.tree.map(jnp.asarray, payload["map"])
        mc.n_kf = payload["n_kf"]
        if payload["kf_bow"] is not None:
            mc.kf_bow = jnp.asarray(payload["kf_bow"])
        self.mm.maps.append(mc)
        get_tracer().event("multihost_map_received", src_proc=src_proc,
                           src_map=payload["map_id"], local_map=mc.map_id,
                           n_kf=mc.n_kf)
        # feed the local merge pipeline: enqueue the imported map's newest
        # keyframes for cross-map scanning
        for s in range(max(0, mc.n_kf - self.reps_per_map), mc.n_kf):
            self.mm.enqueue_scan(mc, s)
        return mc

    def _is_tracked(self, mc: MapContext) -> bool:
        return any(r.mapctx is mc for r in self.mm.robots)

    # -- the collective ----------------------------------------------------
    def exchange(self) -> int:
        """One collective exchange round (call from EVERY process):
        signatures out, candidate payloads back. Returns the number of maps
        imported into the local MultiMapper this round."""
        if self.n_proc == 1:
            return 0
        tr = get_tracer()
        with tr.span("multihost_exchange"):
            sigs = self._local_signatures()
            meta = [{"map_id": s["map_id"], "n_kf": s["n_kf"]} for s in sigs]
            packets = mh.all_gather_bytes(
                pickle.dumps({"sigs": sigs, "meta": meta}), max_len=1 << 20
            )
            all_sigs = [pickle.loads(p) for p in packets]
            # score remote signatures against local databases; request the
            # remote maps that look like merge candidates
            wanted: list[tuple[int, int]] = []  # (proc, map_id)
            for p, pack in enumerate(all_sigs):
                if p == self.process_id:
                    continue
                for sig in pack["sigs"]:
                    if (p, sig["map_id"]) in self._imported:
                        continue
                    score = self._score_remote(sig)
                    if score >= self.score_floor:
                        wanted.append((p, sig["map_id"]))
            # second round: publish requests, then ship every map someone
            # requested (the requester imports it; the owner retires it if
            # no local robot still tracks it)
            req_packets = mh.all_gather_bytes(pickle.dumps(wanted),
                                              max_len=1 << 16)
            all_wanted = [pickle.loads(p) for p in req_packets]
            to_ship = []
            for p, reqs in enumerate(all_wanted):
                if p == self.process_id:
                    continue
                for proc, mid in reqs:
                    if proc == self.process_id and mid not in self._shipped:
                        mc = next((m for m in self.mm.maps
                                   if m.map_id == mid
                                   and m.merged_into is None), None)
                        if mc is not None:
                            to_ship.append(mc)
            blob = pickle.dumps([
                self._pack_map(mc) for mc in {id(m): m for m in to_ship}.values()
            ])
            payloads = mh.all_gather_bytes(blob, max_len=self.payload_max)
            n_imported = 0
            for p, pl in enumerate(payloads):
                if p == self.process_id:
                    continue
                for b in pickle.loads(pl):
                    if self._unpack_map(b, p) is not None:
                        n_imported += 1
            for mc in to_ship:
                self._shipped.add(mc.map_id)
                if not self._is_tracked(mc):
                    # orphan migrates outright: retire it locally
                    mc.merged_into = mc  # self-sentinel: out of live rotation
                    tr.event("multihost_map_migrated", map_id=mc.map_id)
                else:
                    tr.event("multihost_map_copied", map_id=mc.map_id)
                self.transfers.append({"map_id": mc.map_id,
                                       "tracked": self._is_tracked(mc)})
        return n_imported

    def pump(self, rounds: int = 3) -> bool:
        """exchange + drive the local merge pipeline to verify imported
        candidates. Returns True if a merge happened locally."""
        self.exchange()
        merged = False
        for _ in range(rounds):
            merged = self.mm.pump_merge_scans() or merged
        return merged
