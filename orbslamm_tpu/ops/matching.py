"""Hamming descriptor matching as batched MXU matmuls.

Replaces all ~10 specialized matcher variants of the reference
(ORBmatcher.cc — SearchByProjection :45/:292/:1330/:1474, SearchByBoW
:159/:524, SearchForInitialization :407, SearchForTriangulation :659,
SearchBySim3 :1104, Fuse :827/:979, DescriptorDistance :1649) with ONE
TPU-native primitive: a dense masked distance matrix.

Key idea: 256-bit Hamming distance decomposes as
    d(a, b) = pop(a) + pop(b) - 2 * <bits(a), bits(b)>
so the full [N, M] distance matrix is a single [N,256]x[256,M] matmul on the
MXU (values are small integers — exact in f32 accumulation), instead of the
reference's per-candidate XOR-popcount loops. Candidate-set restrictions
(grid window / projection window / epipolar band / BoW bucket) become
additive masks on the distance matrix. At N=M=2048 this is ~2 GFLOP — far
below one MXU-microsecond budget, which is why brute-force-with-masks beats
porting the reference's sparse candidate machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e9)


class Matches(NamedTuple):
    idx: jax.Array  # [N] int32 — index into B for each A feature (undefined where ~ok)
    dist: jax.Array  # [N] float32 — best Hamming distance
    ok: jax.Array  # [N] bool


def unpack_bits(desc_u8: jax.Array) -> jax.Array:
    """[..., 32] uint8 -> [..., 256] float32 in {0, 1}."""
    bits = jnp.unpackbits(desc_u8, axis=-1, bitorder="little")
    return bits.astype(jnp.float32)


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """[N, 32] x [M, 32] uint8 -> [N, M] float32 Hamming distances (0..256)."""
    A = unpack_bits(desc_a)
    B = unpack_bits(desc_b)
    inner = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    pa = jnp.sum(A, axis=-1, keepdims=True)
    pb = jnp.sum(B, axis=-1, keepdims=True)
    return pa + pb.T - 2.0 * inner


def window_mask(xy_a: jax.Array, xy_b: jax.Array, radius) -> jax.Array:
    """[N,2] x [M,2] -> [N,M] bool — Chebyshev window (reference grid search).

    radius may be scalar or per-A-row [N] (projection search uses per-point
    radii scaled by octave).
    """
    d = jnp.abs(xy_a[:, None, :] - xy_b[None, :, :])
    r = jnp.asarray(radius, jnp.float32)
    if r.ndim == 1:
        r = r[:, None]
    return jnp.max(d, axis=-1) <= r


def level_mask(lvl_a: jax.Array, lvl_b: jax.Array, lo: int = -1, hi: int = 1) -> jax.Array:
    """Octave band check (reference: kp.octave in [pred-1, pred+1])."""
    d = lvl_b[None, :] - lvl_a[:, None]
    return (d >= lo) & (d <= hi)


def epipolar_mask(
    F12: jax.Array, xy1: jax.Array, xy2: jax.Array, level2: jax.Array, scale: float
) -> jax.Array:
    """Point-to-epipolar-line band (reference CheckDistEpipolarLine,
    ORBmatcher.cc:750: dsqr < 3.84 * sigma2(octave))."""
    ones = jnp.ones((xy1.shape[0], 1), xy1.dtype)
    l = jnp.concatenate([xy1, ones], axis=1) @ F12.T  # [N, 3] lines in image 2
    num = l[:, None, 0] * xy2[None, :, 0] + l[:, None, 1] * xy2[None, :, 1] + l[:, None, 2]
    den = l[:, 0:1] ** 2 + l[:, 1:2] ** 2
    dsqr = num * num / jnp.maximum(den, 1e-12)
    sigma2 = (scale ** level2.astype(jnp.float32)) ** 2
    return dsqr < 3.84 * sigma2[None, :]


def match(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    allowed: jax.Array | None = None,
    max_dist: float = 50.0,
    ratio: float = 1.0,
    mutual: bool = False,
    angles_a: jax.Array | None = None,
    angles_b: jax.Array | None = None,
    histo_bins: int = 30,
) -> Matches:
    """One-stop matcher: masked best/second-best with ratio, threshold,
    optional mutual-best and rotation-consistency checks.

    ``allowed`` is the composed candidate mask [N, M] (window/epipolar/BoW…).
    ``ratio`` is the best<ratio*second test (reference mfNNratio).
    Rotation consistency keeps only matches whose angle delta falls in the 3
    most popular of ``histo_bins`` bins (reference ComputeThreeMaxima).
    """
    D = hamming_matrix(desc_a, desc_b)
    pen = jnp.where(valid_b[None, :], 0.0, BIG)
    if allowed is not None:
        pen = pen + jnp.where(allowed, 0.0, BIG)
    D = D + pen

    idx = jnp.argmin(D, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(D, idx[:, None], axis=1)[:, 0]
    D2 = D + jax.nn.one_hot(idx, D.shape[1], dtype=D.dtype) * BIG
    second = jnp.min(D2, axis=1)

    ok = valid_a & (best <= max_dist)
    if ratio < 1.0:
        ok &= best < ratio * second
    if mutual:
        rev = jnp.argmin(D, axis=0).astype(jnp.int32)  # best A for each B
        ok &= rev[idx] == jnp.arange(D.shape[0], dtype=jnp.int32)
    if angles_a is not None and angles_b is not None:
        # reference ComputeThreeMaxima: drop 2nd/3rd bins below 0.1x the max
        ok &= _rotation_consistent(ok, angles_a, angles_b, idx, histo_bins)
    return Matches(idx=idx, dist=jnp.where(ok, best, BIG), ok=ok)


def match_windowed(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    xy_a: jax.Array | None = None,
    xy_b: jax.Array | None = None,
    radius_b: jax.Array | None = None,
    level_a: jax.Array | None = None,
    level_b: jax.Array | None = None,
    lvl_lo: float = -1e9,
    lvl_hi: float = 1e9,
    max_dist: float = 50.0,
    ratio: float = 1.0,
    mutual: bool = False,
    angles_a: jax.Array | None = None,
    angles_b: jax.Array | None = None,
    histo_bins: int = 30,
) -> Matches:
    """The hot-path matcher: window + octave-band candidate restriction.

    Same contract as ``match`` with
    ``allowed = window(xy, radius_b) & (lvl_b - lvl_a in [lvl_lo, lvl_hi])``
    but computed through the fused Pallas kernel on TPU (no [N, M]
    materialization in HBM; see ops/pallas/hamming.py). Falls back to an
    equivalent jnp path off-TPU so CPU tests exercise identical semantics.
    """
    from orbslamm_tpu.ops.pallas import hamming as ph

    use_window = xy_a is not None
    aligned = desc_a.shape[0] % 256 == 0 and desc_b.shape[0] % 128 == 0
    if aligned and jax.default_backend() == "tpu":
        t = ph.match_tables(
            desc_a, desc_b, valid_a, valid_b,
            xy_a=xy_a, xy_b=xy_b, radius_b=radius_b,
            level_a=level_a, level_b=level_b,
            lvl_lo=lvl_lo, lvl_hi=lvl_hi, use_window=use_window,
        )
        idx, best, second, col_arg = t.row_arg, t.row_best, t.row_second, t.col_arg
        ok = valid_a & (best <= max_dist)
        if ratio < 1.0:
            ok &= best < ratio * second
        if mutual:
            ok &= col_arg[idx] == jnp.arange(idx.shape[0], dtype=jnp.int32)
        if angles_a is not None and angles_b is not None:
            ok &= _rotation_consistent(ok, angles_a, angles_b, idx, histo_bins)
        return Matches(idx=idx, dist=jnp.where(ok, best, BIG), ok=ok)

    allowed = None
    if use_window:
        allowed = window_mask_b(xy_a, xy_b, radius_b)
    if level_a is not None:
        band = level_mask(level_a, level_b, lo=lvl_lo, hi=lvl_hi)
        allowed = band if allowed is None else (allowed & band)
    return match(
        desc_a, desc_b, valid_a, valid_b, allowed=allowed,
        max_dist=max_dist, ratio=ratio, mutual=mutual,
        angles_a=angles_a, angles_b=angles_b, histo_bins=histo_bins,
    )


def match_epipolar(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    F12: jax.Array,  # fundamental matrix: lines in B's image = [xy_a;1] @ F12.T
    xy_a: jax.Array,
    xy_b: jax.Array,
    level_a: jax.Array,
    level_b: jax.Array,
    scale: float,
    lvl_lo: float = -2.0,
    lvl_hi: float = 2.0,
    max_dist: float = 100.0,
    ratio: float = 1.0,
) -> Matches:
    """Epipolar-band matching for triangulation (SearchForTriangulation,
    ORBmatcher.cc:659). Fused Pallas path on TPU, dense jnp fallback off."""
    from orbslamm_tpu.ops.pallas import hamming as ph

    aligned = desc_a.shape[0] % 256 == 0 and desc_b.shape[0] % 128 == 0
    if aligned and jax.default_backend() == "tpu":
        ones = jnp.ones((xy_a.shape[0], 1), xy_a.dtype)
        lines = jnp.concatenate([xy_a, ones], axis=1) @ F12.T  # [N, 3]
        sigma2 = (scale ** level_b.astype(jnp.float32)) ** 2
        t = ph.match_tables(
            desc_a, desc_b, valid_a, valid_b,
            xy_b=xy_b, level_a=level_a, level_b=level_b,
            lines_a=lines, epi_thr_b=3.84 * sigma2,
            lvl_lo=lvl_lo, lvl_hi=lvl_hi, use_epipolar=True,
        )
        ok = valid_a & (t.row_best <= max_dist)
        if ratio < 1.0:
            ok &= t.row_best < ratio * t.row_second
        return Matches(
            idx=t.row_arg, dist=jnp.where(ok, t.row_best, BIG), ok=ok
        )

    allowed = epipolar_mask(F12, xy_a, xy_b, level_b, scale)
    allowed &= level_mask(level_a, level_b, lo=lvl_lo, hi=lvl_hi)
    return match(
        desc_a, desc_b, valid_a, valid_b, allowed=allowed,
        max_dist=max_dist, ratio=ratio,
    )


def window_mask_b(xy_a: jax.Array, xy_b: jax.Array, radius_b) -> jax.Array:
    """[N,2] x [M,2] -> [N,M] bool — Chebyshev window with PER-COLUMN radii
    (projection searches scale the window by the candidate's octave)."""
    d = jnp.abs(xy_a[:, None, :] - xy_b[None, :, :])
    r = jnp.asarray(radius_b, jnp.float32)
    return jnp.max(d, axis=-1) <= r[None, :]


def _rotation_consistent(ok, angles_a, angles_b, idx, histo_bins: int):
    """Three-maxima rotation-consistency filter (shared by match paths)."""
    two_pi = 2.0 * jnp.pi
    delta = (angles_a - angles_b[idx]) % two_pi
    bins = jnp.clip((delta / two_pi * histo_bins).astype(jnp.int32), 0, histo_bins - 1)
    hist = jnp.zeros((histo_bins,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    counts, top3 = jax.lax.top_k(hist, 3)
    keep_bin = counts >= jnp.maximum(
        (0.1 * counts[0].astype(jnp.float32)).astype(jnp.int32), 1
    )
    return ((bins[:, None] == top3[None, :]) & keep_bin[None, :]).any(axis=1)


def resolve_duplicates(matches: Matches, n_b: int) -> Matches:
    """Keep only the lowest-distance A per matched B (reference matchers
    overwrite worse duplicates, e.g. SearchByProjection ORBmatcher.cc:1398).

    Winner per B column = argmin over A of masked distance.
    """
    n_a = matches.idx.shape[0]
    d = jnp.where(matches.ok, matches.dist, BIG)
    # scatter-min: per target b, the minimal distance
    per_b = jnp.full((n_b,), BIG).at[matches.idx].min(d)
    is_winner = matches.ok & (d <= per_b[matches.idx])
    # tie-break identical distances: keep lowest A index
    first_a = jnp.full((n_b,), n_a, jnp.int32).at[matches.idx].min(
        jnp.where(is_winner, jnp.arange(n_a, dtype=jnp.int32), n_a)
    )
    ok = is_winner & (first_a[matches.idx] == jnp.arange(n_a, dtype=jnp.int32))
    return Matches(idx=matches.idx, dist=matches.dist, ok=ok)
