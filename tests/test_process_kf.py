"""The fused insert pipeline (indicator threaded through stages) must be
exactly equivalent to running the public per-stage wrappers sequentially
(each rebuilding the indicator from scratch)."""

import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.models.system import MonocularSession
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)


def _small_session_map():
    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0, cx=160.0,
                       cy=120.0, fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=400, max_keypoints=512),
        capacity=CapacityConfig(max_keyframes=32, max_landmarks=2048),
        tracking=TrackingConfig(pixel_noise=1.2),
    )
    seq = make_sequence(n_frames=14, n_points=1200, cam=cam, seed=3,
                        motion="orbit")
    sess = MonocularSession(cfg)
    for i in range(14):
        sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    return cfg, sess.tracker.mapctx.map


def test_threaded_indicator_equals_stagewise():
    cfg, m = _small_session_map()
    slot = jnp.int32(int(np.asarray(m.n_kf)) - 1)

    fusedm = lm_stage.process_new_keyframe(cfg, m, slot)

    stagem = lm_stage.triangulate_new_landmarks(cfg, m, slot)
    stagem = lm_stage.fuse_neighbors(cfg, stagem, slot)
    stagem = lm_stage.local_bundle_adjustment(cfg, stagem, slot)
    stagem = lm_stage.cull_landmarks(cfg, stagem, slot)
    stagem = lm_stage.cull_keyframes(cfg, stagem, slot)

    for name, a, b in zip(fusedm._fields, fusedm, stagem):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, name
        if a.dtype == np.float32:
            assert np.allclose(a, b, rtol=1e-5, atol=1e-5), name
        else:
            assert np.array_equal(a, b), name
