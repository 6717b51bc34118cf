"""Map persistence (checkpoint/resume) — the MapSerializer analog.

The reference saves each map as ``mapNNNNNN/map.xml`` via TinyXML
(MapSerializer.cc:60-482, SURVEY.md §5.4); here each map is one ``.npz``
(keyframes with poses/calibration/descriptors, landmarks with positions —
the same content, binary). A MultiMapper session saves a directory of
``map_NNN.npz`` plus a manifest, and loads back into live MapContexts.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.models import map_state as ms
from orbslamm_tpu.utils.config import SlamConfig


def save_map(path: str | Path, m: ms.MapState) -> None:
    arrays = {name: np.asarray(v) for name, v in m._asdict().items()}
    np.savez_compressed(path, **arrays)


def load_map(path: str | Path) -> ms.MapState:
    data = np.load(path)
    return ms.MapState(**{name: jnp.asarray(data[name]) for name in ms.MapState._fields})


def save_session(out_dir: str | Path, multimapper) -> None:
    """Save every live map of a MultiMapper + manifest (SaveMaps analog)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = {"maps": [], "merges": list(multimapper.merges)}
    for mc in multimapper.live_maps():
        fname = f"map_{mc.map_id:06d}.npz"
        save_map(out / fname, mc.map)
        manifest["maps"].append(
            {"file": fname, "map_id": mc.map_id, "n_kf": mc.n_kf}
        )
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))


def load_session(out_dir: str | Path, multimapper) -> None:
    """Load maps saved by save_session into a MultiMapper (LoadMaps analog).
    Vocabulary/BoW rows are rebuilt from the loaded descriptors."""
    from orbslamm_tpu.models.system import MapContext

    out = Path(out_dir)
    manifest = json.loads((out / "manifest.json").read_text())
    for entry in manifest["maps"]:
        mc = MapContext(multimapper.cfg, voc=multimapper.voc)
        mc.map = load_map(out / entry["file"])
        mc.n_kf = entry["n_kf"]
        multimapper.maps.append(mc)
        if mc.ensure_vocabulary() and multimapper.voc is None:
            multimapper.voc = mc.voc
    multimapper.merges.extend(tuple(m) for m in manifest.get("merges", []))
