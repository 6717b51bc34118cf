"""Fused masked Hamming matcher as a Pallas TPU kernel.

The jnp matcher (ops/matching.py) is already MXU-shaped — Hamming distance
as a [N,256]x[256,M] matmul — but XLA materializes the [N,M] distance
matrix plus the composed [N,M] candidate masks in HBM and then re-reads
them for argmin / second-best / column-min passes. At tracking shapes
(N=2048 features x M=4096 landmark candidates) that is >100 MB of HBM
round trips per frame.

This kernel fuses the whole contract into one VMEM-resident pass:

    distance tile (MXU)  +  window mask  +  level-band mask  +  validity
    penalties  →  per-row best / second-best / argmin  and per-column
    best / argmin

so only the O(N+M) inputs and outputs ever touch HBM. The window and
level masks are recomputed in-kernel from per-row/per-column scalars
(x, y, level, radius) instead of being passed as [N,M] arrays — masks are
cheaper to recompute on the VPU than to stream from HBM.

Covers the candidate-restriction patterns of the reference matcher hot
paths (ORBmatcher.cc SearchByProjection :45/:1330 — windowed, octave-band,
per-candidate radius). Column outputs support the mutual-best check
(SearchForInitialization) and duplicate resolution on the host side.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


class MatchTables(NamedTuple):
    row_best: jax.Array  # [N] f32 — best masked distance per A row
    row_second: jax.Array  # [N] f32 — second-best (different column)
    row_arg: jax.Array  # [N] i32 — argmin column per A row
    col_best: jax.Array  # [M] f32 — best masked distance per B column
    col_arg: jax.Array  # [M] i32 — argmin row per B column


def _match_kernel(
    bits_a_ref,  # [TN, 256] bf16 {0,1}
    xa_ref,  # [TN, 1] f32
    ya_ref,
    la_ref,  # [TN, 1] f32 level
    pena_ref,  # [TN, 1] f32 additive row penalty (BIG when invalid)
    lx_ref,  # [TN, 1] f32 epipolar line coefficients (per A row, in B's image)
    ly_ref,
    lz_ref,
    bits_b_ref,  # [M, 256] bf16
    xb_ref,  # [1, M] f32
    yb_ref,
    lb_ref,
    rb_ref,  # [1, M] f32 per-candidate window radius (<=0 disables windowing)
    penb_ref,  # [1, M] f32 popcount(b) + validity penalty
    thr_ref,  # [1, M] f32 per-column epipolar chi2 threshold (3.84 sigma2)
    row_best_ref,  # [TN, 1] f32
    row_second_ref,  # [TN, 1] f32
    row_arg_ref,  # [TN, 1] i32
    col_best_ref,  # [1, M] f32 (revisited across grid steps)
    col_arg_ref,  # [1, M] i32
    *,
    tile_n: int,
    lvl_lo: float,
    lvl_hi: float,
    use_window: bool,
    use_epipolar: bool,
):
    i = pl.program_id(0)
    a = bits_a_ref[:]
    b = bits_b_ref[:]
    M = b.shape[0]

    # Hamming(a, b) = pop(a) + pop(b) - 2 <a, b>  — the matmul rides the MXU
    inner = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, M]
    pa = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)  # [TN, 1]
    D = pa + penb_ref[:] - 2.0 * inner + pena_ref[:]

    if use_window:
        dx = jnp.abs(xa_ref[:] - xb_ref[:])  # [TN, M]
        dy = jnp.abs(ya_ref[:] - yb_ref[:])
        inside = jnp.maximum(dx, dy) <= rb_ref[:]
        D = jnp.where(inside, D, D + BIG)
    if use_epipolar:
        # point-to-epipolar-line distance in B's image (CheckDistEpipolarLine)
        lx, ly, lz = lx_ref[:], ly_ref[:], lz_ref[:]
        num = lx * xb_ref[:] + ly * yb_ref[:] + lz  # [TN, M]
        den = jnp.maximum(lx * lx + ly * ly, 1e-12)
        near = num * num <= thr_ref[:] * den
        D = jnp.where(near, D, D + BIG)
    dl = lb_ref[:] - la_ref[:]
    in_band = (dl >= lvl_lo) & (dl <= lvl_hi)
    D = jnp.where(in_band, D, D + BIG)

    # per-row best / argmin (first-min tie: lowest column index) / second
    rbest = jnp.min(D, axis=1, keepdims=True)  # [TN, 1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, M), 1)
    rarg = jnp.min(jnp.where(D <= rbest, cidx, M), axis=1, keepdims=True)
    rsecond = jnp.min(
        jnp.where(cidx == rarg, D + BIG, D), axis=1, keepdims=True
    )
    row_best_ref[:] = rbest
    row_second_ref[:] = rsecond
    row_arg_ref[:] = rarg

    # per-column running min across row tiles (earlier row wins ties)
    grow = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_n, M), 0)
    cbest_t = jnp.min(D, axis=0, keepdims=True)  # [1, M]
    carg_t = jnp.min(
        jnp.where(D <= cbest_t, grow, jnp.iinfo(jnp.int32).max),
        axis=0,
        keepdims=True,
    )

    @pl.when(i == 0)
    def _():
        col_best_ref[:] = cbest_t
        col_arg_ref[:] = carg_t

    @pl.when(i > 0)
    def _():
        prev_best = col_best_ref[:]
        prev_arg = col_arg_ref[:]
        upd = cbest_t < prev_best
        col_best_ref[:] = jnp.where(upd, cbest_t, prev_best)
        col_arg_ref[:] = jnp.where(upd, carg_t, prev_arg)


@functools.partial(
    jax.jit,
    static_argnames=(
        "lvl_lo", "lvl_hi", "use_window", "use_epipolar", "tile_n", "interpret"
    ),
)
def match_tables(
    desc_a: jax.Array,  # [N, 32] uint8
    desc_b: jax.Array,  # [M, 32] uint8
    valid_a: jax.Array,  # [N] bool
    valid_b: jax.Array,  # [M] bool
    xy_a: jax.Array | None = None,  # [N, 2] f32
    xy_b: jax.Array | None = None,  # [M, 2] f32
    radius_b: jax.Array | None = None,  # [M] f32 per-candidate radius
    level_a: jax.Array | None = None,  # [N] int/float
    level_b: jax.Array | None = None,  # [M]
    lines_a: jax.Array | None = None,  # [N, 3] epipolar lines in B's image
    epi_thr_b: jax.Array | None = None,  # [M] f32 chi2 threshold per column
    lvl_lo: float = -1e9,
    lvl_hi: float = 1e9,
    use_window: bool = False,
    use_epipolar: bool = False,
    tile_n: int = 256,
    interpret: bool = False,
) -> MatchTables:
    """Fused masked match: returns per-row and per-column best tables.

    Equivalent to building D = hamming + validity/window/level/epipolar
    penalties and taking row-wise (min, argmin, second-min) and column-wise
    (min, argmin) — without materializing D.
    """
    N = desc_a.shape[0]
    M = desc_b.shape[0]
    if N % tile_n:
        raise ValueError(f"N={N} must be a multiple of tile_n={tile_n}")
    if M % 128:
        raise ValueError(f"M={M} must be a multiple of 128")

    bits_a = jnp.unpackbits(desc_a, axis=-1, bitorder="little").astype(jnp.bfloat16)
    bits_b = jnp.unpackbits(desc_b, axis=-1, bitorder="little").astype(jnp.bfloat16)
    f32 = jnp.float32
    zero_n = jnp.zeros((N, 1), f32)
    zero_m = jnp.zeros((1, M), f32)
    xa = zero_n if xy_a is None else xy_a[:, 0:1].astype(f32)
    ya = zero_n if xy_a is None else xy_a[:, 1:2].astype(f32)
    xb = zero_m if xy_b is None else xy_b[:, 0].astype(f32)[None, :]
    yb = zero_m if xy_b is None else xy_b[:, 1].astype(f32)[None, :]
    rb = zero_m if radius_b is None else radius_b.astype(f32)[None, :]
    la = zero_n if level_a is None else level_a.astype(f32)[:, None]
    lb = zero_m if level_b is None else level_b.astype(f32)[None, :]
    lx = zero_n if lines_a is None else lines_a[:, 0:1].astype(f32)
    ly = zero_n if lines_a is None else lines_a[:, 1:2].astype(f32)
    lz = zero_n if lines_a is None else lines_a[:, 2:3].astype(f32)
    thr = zero_m if epi_thr_b is None else epi_thr_b.astype(f32)[None, :]
    pena = jnp.where(valid_a, 0.0, BIG).astype(f32)[:, None]
    popb = jnp.sum(bits_b.astype(f32), axis=1)
    penb = (popb + jnp.where(valid_b, 0.0, BIG))[None, :]

    grid = (N // tile_n,)
    row_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _match_kernel,
        tile_n=tile_n,
        lvl_lo=float(lvl_lo),
        lvl_hi=float(lvl_hi),
        use_window=use_window,
        use_epipolar=use_epipolar,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            pl.BlockSpec((M, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            col_spec, col_spec, col_spec, col_spec, col_spec, col_spec,
        ],
        out_specs=(
            row_spec, row_spec,
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            col_spec,
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), f32),
            jax.ShapeDtypeStruct((N, 1), f32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, M), f32),
            jax.ShapeDtypeStruct((1, M), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * 256 + 8 * N * M,
            bytes_accessed=(N + M) * 256 * 2 + (N + M) * 24,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_a, xa, ya, la, pena, lx, ly, lz, bits_b, xb, yb, lb, rb, penb, thr)
    row_best, row_second, row_arg, col_best, col_arg = out
    return MatchTables(
        row_best=row_best[:, 0],
        row_second=row_second[:, 0],
        row_arg=jnp.minimum(row_arg[:, 0], M - 1),
        col_best=col_best[0],
        col_arg=jnp.where(col_arg[0] == jnp.iinfo(jnp.int32).max, 0, col_arg[0]),
    )
