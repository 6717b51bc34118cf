"""Serialization, viz, and driver machinery tests."""

import numpy as np
import pytest

from orbslamm_tpu.io import serialize
from orbslamm_tpu.io.synthetic import fabricate_map
from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.ops import geometry as geo
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig,
)

CFG = SlamConfig(
    camera=CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120),
    orb=OrbConfig(n_features=300, max_keypoints=512, n_levels=4),
    capacity=CapacityConfig(max_keyframes=32, max_landmarks=4096),
)


def small_map(seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    T = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    for i in range(4):
        T[i, 0, 3] = 0.3 * i
    pts = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    pts[:, 2] += 8
    desc = rng.integers(0, 256, (400, 32), dtype=np.uint8)
    m, _ = fabricate_map(CFG, T, pts, desc, seed=seed)
    return m


def test_map_save_load_roundtrip(tmp_path):
    m = small_map()
    serialize.save_map(tmp_path / "m.npz", m)
    m2 = serialize.load_map(tmp_path / "m.npz")
    for name in m._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(m, name)), np.asarray(getattr(m2, name)), err_msg=name
        )


def test_session_save_load(tmp_path):
    mm = MultiMapper(CFG)
    mc = mm.new_map()
    mc.map = small_map()
    mc.n_kf = 4
    serialize.save_session(tmp_path / "sess", mm)

    mm2 = MultiMapper(CFG)
    serialize.load_session(tmp_path / "sess", mm2)
    assert len(mm2.maps) == 1
    assert mm2.maps[0].n_kf == 4
    assert int(mm2.maps[0].map.kf_valid.sum()) == 4
    # vocabulary was rebuilt from the loaded descriptors
    assert mm2.maps[0].voc is not None


def test_draw_map(tmp_path):
    from orbslamm_tpu.io import viz

    m = small_map()
    viz.draw_map(m, tmp_path / "map.png")
    assert (tmp_path / "map.png").stat().st_size > 5000
