"""ORB feature extraction as a batched, fixed-shape JAX program.

Replaces the reference's ORBextractor (ORBextractor.cc:1043 operator(),
:765 ComputeKeyPointsOctTree, :539 DistributeOctTree, :77 IC_Angle,
:108 computeOrbDescriptor) with a TPU-native design:

  * FAST-16 corner response is computed for EVERY pixel as the exact
    max-threshold score (the largest t for which a 9-contiguous arc of the
    16-pixel Bresenham circle is uniformly brighter/darker than center±t) —
    one vectorized pass, no per-pixel branching.  The reference's two-stage
    threshold fallback (iniThFAST=20 → minThFAST=7 per cell) is subsumed:
    score >= 20 ⇔ high-threshold corner, score >= 7 ⇔ fallback corner.
  * The pointer quadtree (DistributeOctTree) becomes a deterministic
    cell-rank spread selection: each corner is ranked inside its spatial
    cell by response, and selection order is (cell_rank asc, response desc).
    Same behavioral contract — ≤N well-spread corners, best-per-region
    first, weak regions still represented.
  * Orientation (intensity centroid, 31×31 circular mask) comes from
    full-image prefix-sum moment maps + per-keypoint point gathers, and the
    256-bit rotated binary descriptor samples a 256-point pool directly
    from the blurred level image — no per-keypoint patch gathers anywhere
    (random-access gathers are TPU's slowest primitive; see
    orientation_maps and the concatenated single-gather sample
    stage in make_extractor). The descriptor test pattern is this
    framework's own fixed pseudo-random BRIEF pattern (NOT copied from
    OpenCV's learned table).
  * All shapes are static per (OrbConfig, image size): per-level keypoint
    budgets are the reference's geometric distribution, invalid slots are
    masked.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.utils.config import CameraConfig, OrbConfig

PATCH_R = 20  # gather patch radius: covers rotated pattern (|p|<=13 → 19) + rounding
PATCH = 2 * PATCH_R + 1
IC_R = 15  # intensity-centroid circular mask radius (reference PATCH_SIZE 31)
EDGE = PATCH_R  # keypoints must be >= EDGE px from the level border

# 16-point Bresenham circle, radius 3, in circular order (dx, dy)
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    np.int32,
)


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (the Frame data of the reference)."""

    xy: jax.Array  # [M, 2] float32 — undistorted pixel coords at level 0
    xy_raw: jax.Array  # [M, 2] float32 — raw (distorted) pixel coords
    angle: jax.Array  # [M] float32 radians
    response: jax.Array  # [M] float32
    level: jax.Array  # [M] int32 pyramid octave
    desc: jax.Array  # [M, 32] uint8 — 256-bit descriptor
    valid: jax.Array  # [M] bool
    # stereo / RGB-D extensions (reference Frame::mvuRight / mvDepth) —
    # None for monocular frames; filled by ops/stereo.py
    u_right: jax.Array | None = None  # [M] float32, -1 where no stereo match
    depth: jax.Array | None = None  # [M] float32, -1 where unknown

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]


# ---------------------------------------------------------------------------
# Descriptor test pattern (own fixed pseudo-random BRIEF pattern)
# ---------------------------------------------------------------------------
#
# TPU-native design: the 256 binary tests draw from a SHARED pool of
# N_SAMPLE_POINTS sample positions instead of 512 independent endpoints.
# Per-keypoint image sampling is a random-access gather — the dominant cost
# of descriptor extraction on TPU — so halving the gathered points
# (512 → 256) halves the hot loop. Each pool point is reused by ~2 tests:
# at 128 points the induced bit correlations measurably blur the
# best-vs-second-best match margin (ratio-test recall drops on loop
# candidate pairs); 256 keeps the margin while still saving the gathers.

N_SAMPLE_POINTS = 256


@functools.lru_cache(maxsize=1)
def pattern_points() -> np.ndarray:
    """[N_SAMPLE_POINTS, 2] int32 sample offsets in [-13, 13]."""
    rng = np.random.default_rng(20240817)
    pts = rng.normal(0.0, 6.2, size=(N_SAMPLE_POINTS, 2))
    return np.clip(np.round(pts), -13, 13).astype(np.int32)


@functools.lru_cache(maxsize=1)
def pattern_tests() -> np.ndarray:
    """[256, 2] int32 — (i, j) indices into pattern_points per bit."""
    rng = np.random.default_rng(20240818)
    a = rng.integers(0, N_SAMPLE_POINTS, size=256)
    b = rng.integers(0, N_SAMPLE_POINTS, size=256)
    pts = pattern_points()
    # a test comparing a point against itself (same coordinates after
    # clipping) yields a constant descriptor bit — walk b until every pair
    # lands on distinct coordinates
    for _ in range(N_SAMPLE_POINTS):
        clash = (a == b) | np.all(pts[a] == pts[b], axis=-1)
        if not clash.any():
            break
        b = np.where(clash, (b + 17) % N_SAMPLE_POINTS, b)
    assert not ((a == b) | np.all(pts[a] == pts[b], axis=-1)).any()
    return np.stack([a, b], axis=-1).astype(np.int32)


@functools.lru_cache(maxsize=1)
def ic_row_halfwidths() -> np.ndarray:
    """[2*IC_R+1] int32 — half-width of the circular intensity-centroid mask
    at each dy row (|dx| <= floor(sqrt(IC_R^2 - dy^2)))."""
    r = np.arange(-IC_R, IC_R + 1)
    return np.floor(np.sqrt(np.maximum(IC_R * IC_R - r * r, 0) + 1e-9)).astype(
        np.int32
    )


def level_feature_counts(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Reference geometric per-level budget (ORBextractor.cc ctor)."""
    f = 1.0 / scale
    total = n_features * (1 - f) / (1 - f**n_levels)
    counts = [int(round(total * f**l)) for l in range(n_levels - 1)]
    counts.append(max(n_features - sum(counts), 1))
    return counts


# ---------------------------------------------------------------------------
# Per-level pieces
# ---------------------------------------------------------------------------

def gaussian_blur7(img: jax.Array) -> jax.Array:
    """Separable 7x7 Gaussian, sigma=2 (reference GaussianBlur before
    descriptors, ORBextractor.cc:1105)."""
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-(x**2) / (2 * 2.0**2))
    k /= k.sum()
    k = jnp.asarray(k)
    pad = jnp.pad(img, ((3, 3), (0, 0)), mode="edge")
    img = sum(pad[i : i + img.shape[0], :] * k[i] for i in range(7))
    pad = jnp.pad(img, ((0, 0), (3, 3)), mode="edge")
    img = sum(pad[:, i : i + img.shape[1]] * k[i] for i in range(7))
    return img


def fast_score(img: jax.Array) -> jax.Array:
    """Exact FAST-16/9 max-threshold score per pixel.

    score(p) = max over bright/dark polarity of
               max over the 16 arcs of 9 consecutive circle pixels of
               min over the arc of polarity*(circle_px - center)
    A pixel is a FAST corner at threshold t iff score > t.
    """
    H, W = img.shape
    pad = jnp.pad(img, 3, mode="edge").astype(jnp.float32)
    center = img.astype(jnp.float32)
    diffs = jnp.stack(
        [pad[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] - center for dx, dy in _CIRCLE],
        axis=0,
    )  # [16, H, W]

    def sliding_min9_max(ext):
        """max over the 16 9-wide sliding-window minima of ext [24,H,W] —
        van Herk/Gil-Werman: block prefix/suffix minima give every window
        min in 2 passes (~64 [H,W] ops) instead of 16x9 slice reductions."""
        w = 9
        n = ext.shape[0]  # 24
        # forward prefix minima within blocks of w
        F = [ext[0]]
        for i in range(1, n):
            F.append(ext[i] if i % w == 0 else jnp.minimum(F[-1], ext[i]))
        # backward suffix minima within the same blocks
        G = [None] * n
        G[n - 1] = ext[n - 1]
        for i in range(n - 2, -1, -1):
            G[i] = ext[i] if (i + 1) % w == 0 else jnp.minimum(G[i + 1], ext[i])
        best = jnp.full((H, W), -1e9, jnp.float32)
        for s in range(16):
            best = jnp.maximum(best, jnp.minimum(G[s], F[s + w - 1]))
        return best

    ext_b = jnp.concatenate([diffs, diffs[:8]], axis=0)  # [24,H,W]
    best = jnp.maximum(sliding_min9_max(ext_b), sliding_min9_max(-ext_b))
    return jnp.maximum(best, 0.0)


def _nms3(score: jax.Array) -> jax.Array:
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= m


def select_level_keypoints(
    score: jax.Array, n_slots: int, min_th: float, cell: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Spread-aware top-k corner selection on one pyramid level.

    Returns (xy [n_slots, 2] int32 level coords, response [n_slots], valid).
    """
    H, W = score.shape
    keep = _nms3(score) & (score > min_th)
    # border: keypoints must be EDGE away from the level boundary
    border = jnp.zeros_like(keep)
    border = border.at[EDGE : H - EDGE, EDGE : W - EDGE].set(True)
    keep &= border
    eff = jnp.where(keep, score, -1.0)

    # pad to cell multiples; per-cell top-kc replaces the double argsort
    # (two [n_cells, cell^2] argsorts + one [H*W] top_k are three ~HW-sized
    # sorts per level — the kc-candidate cut keeps the global sort at
    # [n_cells*kc] and one per-cell partial sort, ~3x cheaper on the VPU)
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    nch, ncw = Hp // cell, Wp // cell
    n_cells = nch * ncw
    effp = jnp.full((Hp, Wp), -1.0, jnp.float32).at[:H, :W].set(eff)
    cells = effp.reshape(nch, cell, ncw, cell)
    cells = cells.transpose(0, 2, 1, 3).reshape(n_cells, cell * cell)
    kc = min(cell * cell, max(8, -(-4 * n_slots // n_cells)))
    vals, pos = jax.lax.top_k(cells, kc)  # [n_cells, kc], response-sorted

    # selection key: spread first (cell rank), then strength
    rank = jnp.broadcast_to(
        jnp.arange(kc, dtype=jnp.float32)[None, :], vals.shape
    )
    key = jnp.where(vals > 0, rank * 512.0 + (256.0 - jnp.minimum(vals, 255.0)), 1e9)
    neg_key, sel = jax.lax.top_k(-key.reshape(-1), n_slots)
    valid = neg_key > -1e9
    cell_id = sel // kc
    within = pos.reshape(-1)[sel]
    x = (cell_id % ncw) * cell + within % cell
    y = (cell_id // ncw) * cell + within // cell
    xy = jnp.stack([x, y], axis=-1).astype(jnp.int32)
    # padding cells never win (eff=-1 ⇒ key=1e9 ⇒ ~valid), but clamp anyway
    xy = jnp.minimum(xy, jnp.asarray([W - 1, H - 1], jnp.int32))
    resp = vals.reshape(-1)[sel]
    return xy, jnp.where(valid, resp, 0.0), valid


def orientation_maps(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full-image intensity-centroid moment maps (m10, m01), each [H, W].

    Patch-free reformulation of IC_Angle (ORBextractor.cc:77): the circular
    mask decomposes into per-row segments, so both moments are sums of
    x-prefix-sum differences — a few cumsums + 62 shifted adds of
    image-sized arrays, instead of a [K, 31, 31] per-keypoint patch gather
    (random-access gathers are the slowest primitive on TPU; full-image
    passes stream at HBM bandwidth).

    Precision: the x-weighted prefix is computed per COLUMN TILE with a
    locally-centered x coordinate, so its magnitude stays ~1e6 (f32 ulp
    <= 0.125) instead of ~1e8+ for a whole KITTI-width row — without this
    the segment differences cancel catastrophically and IC angles of
    near-symmetric patches wander by degrees at large x.
    """
    H, W = img.shape
    pad = IC_R + 1
    TB = 256  # column tile width
    ip = jnp.pad(img, ((pad, pad), (pad, pad)))
    halfw = ic_row_halfwidths()
    m10_tiles, m01_tiles = [], []
    for t0 in range(0, W, TB):
        tw = min(TB, W - t0)  # output columns [t0, t0+tw)
        # tile slice of the padded image covering x' in [t0-pad, t0+tw+pad)
        tile = ip[:, t0 : t0 + tw + 2 * pad]
        S = jnp.cumsum(tile, axis=1)
        c = pad + tw // 2  # local center
        xloc = (jnp.arange(tile.shape[1], dtype=img.dtype) - c)[None, :]
        T = jnp.cumsum(tile * xloc, axis=1)  # prefix of (x'-c)*I, bounded
        m10 = jnp.zeros((H, tw), img.dtype)
        m01 = jnp.zeros((H, tw), img.dtype)
        x0 = jnp.arange(tw, dtype=img.dtype)[None, :] + pad - c
        for k, dy in enumerate(range(-IC_R, IC_R + 1)):
            w = int(halfw[k])
            rowS = S[pad + dy : pad + dy + H]
            rowT = T[pad + dy : pad + dy + H]
            # segment sum over x' in [x-w, x+w]: S[x+w] - S[x-w-1]
            hi = slice(pad + w, pad + w + tw)
            lo = slice(pad - w - 1, pad - w - 1 + tw)
            rowsum = rowS[:, hi] - rowS[:, lo]
            tsum = rowT[:, hi] - rowT[:, lo]
            m10 = m10 + (tsum - x0 * rowsum)  # sum of dx * I over the segment
            m01 = m01 + float(dy) * rowsum
        m10_tiles.append(m10)
        m01_tiles.append(m01)
    if len(m10_tiles) == 1:
        return m10_tiles[0], m01_tiles[0]
    return jnp.concatenate(m10_tiles, axis=1), jnp.concatenate(m01_tiles, axis=1)


def _orientation_at(img: jax.Array, xy: jax.Array) -> jax.Array:
    """[H,W] raw level image + [K,2] int32 keypoints -> [K] IC angles."""
    m10, m01 = orientation_maps(img)
    W = img.shape[1]
    idx = xy[:, 1] * W + xy[:, 0]
    g10 = jnp.take(m10.reshape(-1), idx)
    g01 = jnp.take(m01.reshape(-1), idx)
    return jnp.arctan2(g01, g10)


# ---------------------------------------------------------------------------
# Undistortion (Frame.cc UndistortKeyPoints equivalent)
# ---------------------------------------------------------------------------

def undistort_points(xy: jax.Array, cam: CameraConfig) -> jax.Array:
    """Iterative inverse of the radtan distortion model; [..., 2] pixels."""
    if cam.k1 == 0 and cam.k2 == 0 and cam.p1 == 0 and cam.p2 == 0 and cam.k3 == 0:
        return xy
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    xd = (xy[..., 0] - cx) / fx
    yd = (xy[..., 1] - cy) / fy
    x, y = xd, yd
    for _ in range(8):
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
        dx = 2 * cam.p1 * x * y + cam.p2 * (r2 + 2 * x * x)
        dy = cam.p1 * (r2 + 2 * y * y) + 2 * cam.p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

def make_extractor(orb: OrbConfig, cam: CameraConfig,
                   n_features: int | None = None,
                   max_keypoints: int | None = None):
    """Build a jitted ``image_u8 [H, W] -> Features`` extractor.

    ``n_features`` overrides orb.n_features (the reference tracks with N but
    initializes with 2N — Tracking.cc:120-126 builds two extractors).
    ``max_keypoints`` overrides the padded output capacity — an init-only
    extractor may exceed the map's per-frame feature capacity (its output
    is truncated back before keyframe insertion).
    """
    H, W = cam.height, cam.width
    n_feat = n_features or orb.n_features
    counts = level_feature_counts(n_feat, orb.n_levels, orb.scale_factor)
    level_shapes = []
    for l in range(orb.n_levels):
        s = orb.scale_factor**l
        level_shapes.append((max(int(round(H / s)), 2 * EDGE + 2), max(int(round(W / s)), 2 * EDGE + 2)))
    M = max_keypoints or orb.max_keypoints
    total = sum(counts)
    if total > M:
        raise ValueError(f"max_keypoints {M} < total level budget {total}")

    # static per-level flat-buffer offsets for the concatenated sample stage
    level_off = []
    acc = 0
    for (Hl, Wl) in level_shapes:
        level_off.append(acc)
        acc += Hl * Wl

    @jax.jit
    def extract(image_u8: jax.Array) -> Features:
        img0 = image_u8.astype(jnp.float32)
        xs_lvl, resps, valids, levels = [], [], [], []
        blur_parts, m10_parts, m01_parts = [], [], []
        base_parts, W_parts = [], []
        for l, ((Hl, Wl), n_l) in enumerate(zip(level_shapes, counts)):
            img = (
                img0
                if l == 0
                else jax.image.resize(img0, (Hl, Wl), method="linear")
            )
            score = fast_score(img)
            xy, resp, valid = select_level_keypoints(
                score, n_l, float(orb.min_th_fast), orb.cell_size
            )
            blur_parts.append(gaussian_blur7(img).reshape(-1))
            m10, m01 = orientation_maps(img)
            m10_parts.append(m10.reshape(-1))
            m01_parts.append(m01.reshape(-1))
            xs_lvl.append(xy)
            resps.append(resp)
            valids.append(valid)
            levels.append(jnp.full((n_l,), l, jnp.int32))
            base_parts.append(jnp.full((n_l,), level_off[l], jnp.int32))
            W_parts.append(jnp.full((n_l,), Wl, jnp.int32))

        # ---- concatenated sample stage: ONE orientation gather + ONE
        # descriptor gather across ALL levels (per-level stages above are
        # image-wise convolutions; the per-keypoint random-access work is
        # batched here so small pyramid levels stop paying per-level kernel
        # overheads) -------------------------------------------------------
        blur_flat = jnp.concatenate(blur_parts)
        m10_flat = jnp.concatenate(m10_parts)
        m01_flat = jnp.concatenate(m01_parts)
        xy_lvl = jnp.concatenate(xs_lvl)  # [total, 2] int32 level coords
        base = jnp.concatenate(base_parts)
        Wk = jnp.concatenate(W_parts)
        anchor = base + xy_lvl[:, 1] * Wk + xy_lvl[:, 0]
        g10 = jnp.take(m10_flat, anchor)
        g01 = jnp.take(m01_flat, anchor)
        ang_all = jnp.arctan2(g01, g10)

        pts = jnp.asarray(pattern_points())  # [P,2]
        tests = pattern_tests()  # np [256,2] static
        c = jnp.cos(ang_all)[:, None]
        s = jnp.sin(ang_all)[:, None]
        px = pts[:, 0][None]
        py = pts[:, 1][None]
        rx = jnp.round(c * px - s * py).astype(jnp.int32)
        ry = jnp.round(s * px + c * py).astype(jnp.int32)
        # keypoints are >= EDGE(20) from every level border and |rotated
        # pattern point| <= 19, so no clipping is needed
        idx = anchor[:, None] + ry * Wk[:, None] + rx
        v = jnp.take(blur_flat, idx.reshape(-1)).reshape(idx.shape)  # [N,P]
        bits = (v[:, tests[:, 0]] < v[:, tests[:, 1]]).astype(jnp.uint8)
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
        desc_all = jnp.sum(
            bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1
        ).astype(jnp.uint8)

        scales = jnp.concatenate([
            jnp.full((n_l,), orb.scale_factor**l, jnp.float32)
            for l, n_l in enumerate(counts)
        ])
        xy_raw_all = xy_lvl.astype(jnp.float32) * scales[:, None]
        pad = M - total

        def cat(out):
            if pad:
                out = jnp.pad(out, [(0, pad)] + [(0, 0)] * (out.ndim - 1))
            return out

        xy_raw = cat(xy_raw_all)
        resp = cat(jnp.concatenate(resps))
        valid = cat(jnp.concatenate(valids))
        ang = cat(ang_all)
        desc = cat(desc_all)
        lvl = cat(jnp.concatenate(levels))
        xy_und = undistort_points(xy_raw, cam)
        return Features(
            xy=jnp.where(valid[:, None], xy_und, 0.0),
            xy_raw=xy_raw,
            angle=ang,
            response=resp,
            level=lvl,
            desc=desc,
            valid=valid,
        )

    return extract
