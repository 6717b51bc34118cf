"""Dev-only profiling: per-part timing of the fused chunk step."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/orbslamm_jax_cache")
import jax, jax.numpy as jnp
import numpy as np

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.models.system import MonocularSession, TrackingState
from orbslamm_tpu.models import fused, map_state as ms, tracking as trk
from orbslamm_tpu.models import local_mapping as lm_stage
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)

cam = CameraConfig(width=640, height=480, fx=520.9, fy=521.0, cx=325.1,
                   cy=249.7, fps=30)
cfg = SlamConfig(
    camera=cam,
    orb=OrbConfig(n_features=1000, max_keypoints=2048),
    capacity=CapacityConfig(max_keyframes=128, max_landmarks=8192),
    tracking=TrackingConfig(pixel_noise=1.2),
)
CHUNK = 8
n_frames = 80
seq = make_sequence(n_frames=n_frames, n_points=2500, cam=cam, seed=7,
                    motion="forward")
sess = MonocularSession(cfg)
sess.tracker.chunk_size = CHUNK
i = 0
while sess.state != TrackingState.OK and i < n_frames:
    sess.process_frame(seq.images[i], float(seq.timestamps[i]))
    i += 1
assert sess.state == TrackingState.OK
for _ in range(2):
    sess.process_frames(seq.images[i:i+CHUNK], seq.timestamps[i:i+CHUNK])
    i += CHUNK

tr = sess.tracker
m = tr.mapctx.map
ts = tr._ts
K = tr.K
extract = tr.extract
images = jnp.asarray(seq.images[i:i+CHUNK])
fids = jnp.arange(CHUNK, dtype=jnp.int32)
tss = jnp.asarray(seq.timestamps[i:i+CHUNK], jnp.float32)

def timeit(name, fn, n=10):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:38s} {dt:8.2f} ms")
    return dt

# 1. batched extraction
ex8 = jax.jit(lambda im: jax.vmap(extract)(im))
timeit("extract x8 (vmap)", lambda: ex8(images))

# 2. single extraction
timeit("extract x1", lambda: extract(images[0]))

# 3. full chunk step (no donation so we can rerun)
body = fused._make_frame_body(cfg, extract)
dummy_bow = jnp.zeros((), jnp.float32)
chunk_nodonate = jax.jit(
    lambda m_, ts_, im, fi, t: fused._chunk_body(
        body, extract, m_, ts_, dummy_bow, None, im, fi, t, K, True))
timeit("full chunk x8", lambda: chunk_nodonate(m, ts, images, fids, tss), n=5)

# 4. chunk with keyframes disabled (tracking only) — jit hoisted out of the
# timed closure so iterations reuse ONE compiled program
chunk_nokf = jax.jit(lambda m_, ts_, im, fi, t: fused._chunk_body(
    body, extract, m_, ts_, dummy_bow, None, im, fi, t, K, False))
timeit("chunk x8 allow_kf=False",
       lambda: chunk_nokf(m, ts, images, fids, tss), n=5)

# 5. tracking stages alone (1 frame) — inputs passed as runtime operands so
# XLA cannot constant-fold them (a zero-arg closure bakes them in as
# compile-time constants and understates the device cost)
feats = extract(images[0])
T_pred = ts.velocity @ ts.last_T
mm = jax.jit(lambda m_, f_, Tp: trk.track_motion_model(
    cfg, m_, f_, Tp, K, ts.last_feats, ts.last_lm, T_last=ts.last_T))
timeit("track_motion_model x1", lambda: mm(m, feats, T_pred))
r1 = mm(m, feats, T_pred)
lmt = jax.jit(lambda m_, f_, T0, fl: trk.track_local_map(cfg, m_, f_, T0, K, fl))
timeit("track_local_map x1", lambda: lmt(m, feats, r1.T_cw, r1.feat_lm))

# 6. mapping pipeline (insert path) alone
slot = jnp.asarray(int(tr._ts.n_kf), jnp.int32)
m2 = ms.insert_keyframe(m, slot, r1.T_cw, K, feats, r1.feat_lm,
                        jnp.asarray(0, jnp.int32), jnp.asarray(0.0))
# the insert path refreshes the inserted keyframe's indicator row; feed the
# refreshed indicator to the sub-stage timings so their covisibility
# neighborhoods match the real workload
ind = ms.refresh_indicator_row(m2, ms.lm_indicator(m), slot)
pnk = jax.jit(lambda m_, i_: lm_stage.process_new_keyframe_cached(cfg, m_, slot, i_))
timeit("process_new_keyframe (insert path)", lambda: pnk(m2, ind), n=5)

# 7. sub-stages of mapping
tri = jax.jit(lambda m_, i_: lm_stage._triangulate(cfg, m_, slot, i_, 2, 256))
timeit("  _triangulate (2 nbrs)", lambda: tri(m2, ind), n=5)
fu = jax.jit(lambda m_, i_: lm_stage._fuse(cfg, m_, slot, i_, 4))
timeit("  _fuse (4 nbrs + self)", lambda: fu(m2, ind), n=5)
lba = jax.jit(lambda m_, i_: lm_stage._local_ba(cfg, m_, slot, i_, 12, 8, 8))
timeit("  _local_ba (12+8, 8 iters)", lambda: lba(m2, ind), n=5)
cl = jax.jit(lambda m_, i_: lm_stage._cull_landmarks(cfg, m_, slot, i_))
timeit("  _cull_landmarks", lambda: cl(m2, ind))
ck = jax.jit(lambda m_, i_: lm_stage._cull_keyframes(cfg, m_, slot, i_, 6))
timeit("  _cull_keyframes (6)", lambda: ck(m2, ind))
