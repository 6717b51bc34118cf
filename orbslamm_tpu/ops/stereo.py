"""Stereo and RGB-D depth association for extracted features.

Replaces the reference's per-keypoint loops with masked Hamming-matmul
matching on the MXU:

* ``match_stereo`` — rectified left↔right descriptor matching
  (reference Frame::ComputeStereoMatches, Frame.cc: row-banded candidate
  search + best Hamming match + disparity→depth). The reference refines
  disparity with a patch-SAD parabola; here the full [M,M] masked distance
  matrix is one matmul and the row band / octave band / disparity range are
  additive masks — no per-point control flow.
* ``depth_from_depthmap`` — RGB-D association (reference
  Frame::ComputeStereoFromRGBD, Frame.cc): sample the registered depth image
  at each keypoint and synthesize the virtual right coordinate
  ``u_right = u - bf/d``.

Both return ``(u_right [M], depth [M])`` with -1 sentinels, the
``Frame::mvuRight`` / ``mvDepth`` analogs stored on ``Features``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslamm_tpu.ops import matching as mt
from orbslamm_tpu.ops.orb import Features


def match_stereo(
    featsL: Features,
    featsR: Features,
    bf: float,
    scale_factor: float = 1.2,
    th_dist: float = 75.0,
    min_z: float | None = None,
    max_row_band: float = 2.0,
) -> tuple[jax.Array, jax.Array]:
    """Rectified stereo association. Returns (u_right [M], depth [M]).

    th_dist: acceptance Hamming distance — the reference uses
    (TH_HIGH+TH_LOW)/2 = 75 after SAD refinement (Frame.cc ComputeStereoMatches).
    min_z: minimum depth (defaults to the baseline, reference minZ = mb).
    """
    D = mt.hamming_matrix(featsL.desc, featsR.desc)  # [M, M]

    # row band: |vL - vR| <= max_row_band * scale of the LEFT octave
    # (reference searches rows within 2*scaleFactors[octave])
    band = max_row_band * scale_factor ** featsL.level.astype(jnp.float32)
    row_ok = jnp.abs(featsL.xy[:, None, 1] - featsR.xy[None, :, 1]) <= band[:, None]
    # octave band (reference: right octave within [octL-1, octL+1])
    lvl_ok = mt.level_mask(featsL.level, featsR.level)
    # disparity range: 0 < d <= maxD. minZ defaults to the baseline
    # (reference Frame.cc: minZ = mb, minD = 0, maxD = mbf/minZ).
    disp = featsL.xy[:, None, 0] - featsR.xy[None, :, 0]
    max_disp = bf / max(min_z, 1e-6) if min_z else 1e9
    disp_ok = (disp > 0.25) & (disp <= max_disp)
    valid = featsL.valid[:, None] & featsR.valid[None, :]

    mask = row_ok & lvl_ok & disp_ok & valid
    Dm = jnp.where(mask, D, jnp.inf)
    j = jnp.argmin(Dm, axis=1)
    best = jnp.take_along_axis(Dm, j[:, None], axis=1)[:, 0]
    ok = jnp.isfinite(best) & (best <= th_dist)
    # ambiguity rejection the reference leaves to SAD refinement: a wrong
    # in-band winner poisons METRIC depth, so require the winner to beat
    # the runner-up clearly AND be its right feature's mutual best
    M = Dm.shape[1]
    second = jnp.min(
        jnp.where(jax.nn.one_hot(j, M, dtype=bool), jnp.inf, Dm), axis=1
    )
    ok &= best <= 0.85 * jnp.where(jnp.isfinite(second), second, 1e9)
    rev = jnp.argmin(Dm, axis=0)
    ok &= rev[j] == jnp.arange(Dm.shape[0])

    uR = jnp.take(featsR.xy[:, 0], j)
    d = featsL.xy[:, 0] - uR
    depth = bf / jnp.maximum(d, 1e-6)
    u_right = jnp.where(ok, uR, -1.0)
    depth = jnp.where(ok, depth, -1.0)
    return u_right.astype(jnp.float32), depth.astype(jnp.float32)


def refine_disparity(
    img_left: jax.Array,  # [H, W] uint8/float
    img_right: jax.Array,
    xy_left: jax.Array,  # [M, 2] raw left keypoint coords
    u_right: jax.Array,  # [M] coarse right x from descriptor match (-1 invalid)
    w: int = 5,
    r: int = 5,
) -> jax.Array:
    """Subpixel disparity via SAD correlation + parabola fit.

    Reference Frame::ComputeStereoMatches slides an 11x11 patch over ±5
    columns of the right image and fits a parabola through the SAD minimum.
    Batched here: one gather of all left patches [M,P], one of all right
    candidate windows [M,2r+1,P], SAD reduction, closed-form vertex.
    Returns refined u_right (invalid rows pass through).
    """
    H, W = img_left.shape
    L = img_left.astype(jnp.float32)
    Rimg = img_right.astype(jnp.float32)
    M = xy_left.shape[0]
    uL = jnp.clip(jnp.round(xy_left[:, 0]).astype(jnp.int32), w, W - w - 1)
    v = jnp.clip(jnp.round(xy_left[:, 1]).astype(jnp.int32), w, H - w - 1)
    uR0 = jnp.clip(jnp.round(u_right).astype(jnp.int32), w + r, W - w - r - 1)

    dy, dx = jnp.meshgrid(
        jnp.arange(-w, w + 1), jnp.arange(-w, w + 1), indexing="ij"
    )
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)  # [P]
    patchL = L[v[:, None] + dy[None, :], uL[:, None] + dx[None, :]]  # [M, P]
    patchL = patchL - patchL.mean(axis=-1, keepdims=True)
    dr = jnp.arange(-r, r + 1)  # [D]
    cols = uR0[:, None, None] + dr[None, :, None] + dx[None, None, :]  # [M,D,P]
    rows = (v[:, None] + dy[None, :])[:, None, :]  # [M,1,P]
    patchR = Rimg[jnp.broadcast_to(rows, cols.shape), cols]  # [M, D, P]
    patchR = patchR - patchR.mean(axis=-1, keepdims=True)
    sad = jnp.abs(patchR - patchL[:, None, :]).sum(axis=-1)  # [M, D]

    best = jnp.argmin(sad, axis=-1)
    bi = jnp.clip(best, 1, 2 * r - 1)
    s0 = jnp.take_along_axis(sad, (bi - 1)[:, None], axis=1)[:, 0]
    s1 = jnp.take_along_axis(sad, bi[:, None], axis=1)[:, 0]
    s2 = jnp.take_along_axis(sad, (bi + 1)[:, None], axis=1)[:, 0]
    denom = jnp.maximum(s0 + s2 - 2.0 * s1, 1e-6)
    delta = jnp.clip(0.5 * (s0 - s2) / denom, -1.0, 1.0)
    u_ref = uR0.astype(jnp.float32) + (bi - r).astype(jnp.float32) + delta
    # keep the refinement only when the SAD vertex is interior & sane
    ok = (u_right >= 0) & (jnp.abs(u_ref - u_right) <= r + 1.0)
    return jnp.where(ok, u_ref, u_right)


def depth_from_depthmap(
    feats: Features,
    depth_img: jax.Array,  # [H, W] float32 or uint16 raw
    depth_map_factor: float,
    bf: float,
) -> tuple[jax.Array, jax.Array]:
    """RGB-D association: nearest-pixel depth lookup at each (raw) keypoint.

    Mirrors Frame::ComputeStereoFromRGBD — the reference samples the depth
    image at the *distorted* keypoint location (the depth map is registered
    to the raw RGB image) and keeps d > 0.
    """
    H, W = depth_img.shape
    dm = depth_img.astype(jnp.float32)
    if depth_map_factor not in (0.0, 1.0):
        dm = dm / depth_map_factor
    u = jnp.clip(jnp.round(feats.xy_raw[:, 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(feats.xy_raw[:, 1]).astype(jnp.int32), 0, H - 1)
    d = dm[v, u]
    ok = feats.valid & (d > 0.0) & jnp.isfinite(d)
    depth = jnp.where(ok, d, -1.0)
    u_right = jnp.where(ok, feats.xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return u_right.astype(jnp.float32), depth.astype(jnp.float32)


def with_stereo(
    featsL: Features,
    featsR: Features,
    cam,
    scale_factor=1.2,
    img_left: jax.Array | None = None,
    img_right: jax.Array | None = None,
) -> Features:
    """Attach stereo depth to a left Features set. When the images are given,
    disparity is SAD-subpixel refined (reference parity; ~10x less depth
    quantization error on high-octave keypoints)."""
    u_right, depth = match_stereo(
        featsL, featsR, bf=cam.bf, scale_factor=scale_factor,
        min_z=cam.baseline,
    )
    if img_left is not None and img_right is not None:
        u_right = jnp.where(
            u_right >= 0,
            refine_disparity(img_left, img_right, featsL.xy_raw, u_right),
            u_right,
        )
        disp = featsL.xy[:, 0] - u_right
        depth = jnp.where(
            (u_right >= 0) & (disp > 0.25), cam.bf / jnp.maximum(disp, 1e-6), -1.0
        )
    return featsL._replace(u_right=u_right, depth=depth)


def with_depthmap(feats: Features, depth_img, cam) -> Features:
    """Attach RGB-D depth to a Features set."""
    u_right, depth = depth_from_depthmap(
        feats, depth_img, cam.depth_map_factor, cam.bf
    )
    return feats._replace(u_right=u_right, depth=depth)
