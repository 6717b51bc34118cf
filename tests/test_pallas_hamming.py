"""Pallas fused masked matcher vs the dense jnp reference.

Runs the kernel in interpreter mode (CPU) and checks exact equality of the
row/column best tables against an explicitly materialized distance matrix,
across windowing, octave bands, and validity masks — the contracts the
tracking hot path (models/tracking.py) relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.ops import matching
from orbslamm_tpu.ops.pallas import hamming as ph


def _dense_tables(desc_a, desc_b, valid_a, valid_b, allowed):
    D = matching.hamming_matrix(desc_a, desc_b)
    D = D + jnp.where(valid_a[:, None], 0.0, ph.BIG)
    D = D + jnp.where(valid_b[None, :], 0.0, ph.BIG)
    if allowed is not None:
        D = D + jnp.where(allowed, 0.0, ph.BIG)
    row_arg = jnp.argmin(D, axis=1).astype(jnp.int32)
    row_best = jnp.min(D, axis=1)
    D2 = D + jax.nn.one_hot(row_arg, D.shape[1], dtype=D.dtype) * ph.BIG
    row_second = jnp.min(D2, axis=1)
    col_arg = jnp.argmin(D, axis=0).astype(jnp.int32)
    col_best = jnp.min(D, axis=0)
    return row_best, row_second, row_arg, col_best, col_arg


def _rand_case(rng, n, m):
    desc_a = jnp.asarray(rng.integers(0, 256, (n, 32), dtype=np.uint8))
    desc_b = jnp.asarray(rng.integers(0, 256, (m, 32), dtype=np.uint8))
    # duplicated descriptors exercise tie-breaking
    desc_b = desc_b.at[1].set(desc_a[0])
    desc_b = desc_b.at[m - 1].set(desc_a[0])
    valid_a = jnp.asarray(rng.random(n) > 0.1)
    valid_b = jnp.asarray(rng.random(m) > 0.1)
    xy_a = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
    xy_b = jnp.asarray(rng.uniform(0, 640, (m, 2)).astype(np.float32))
    radius_b = jnp.asarray(rng.uniform(50, 400, (m,)).astype(np.float32))
    level_a = jnp.asarray(rng.integers(0, 8, (n,)), dtype=jnp.int32)
    level_b = jnp.asarray(rng.integers(0, 8, (m,)), dtype=jnp.int32)
    return desc_a, desc_b, valid_a, valid_b, xy_a, xy_b, radius_b, level_a, level_b


@pytest.mark.parametrize("n,m", [(256, 128), (512, 384)])
def test_tables_match_dense_windowed(n, m):
    rng = np.random.default_rng(0)
    da, db, va, vb, xa, xb, rb, la, lb = _rand_case(rng, n, m)
    t = ph.match_tables(
        da, db, va, vb, xy_a=xa, xy_b=xb, radius_b=rb,
        level_a=la, level_b=lb, lvl_lo=-1.0, lvl_hi=2.0,
        use_window=True, interpret=True,
    )
    allowed = matching.window_mask_b(xa, xb, rb) & matching.level_mask(
        la, lb, lo=-1, hi=2
    )
    rbest, rsec, rarg, cbest, carg = _dense_tables(da, db, va, vb, allowed)
    # distances agree exactly below the penalty band; masked-out entries
    # only need to stay masked (penalty accumulation differs by design)
    live_r = np.asarray(rbest) <= 256.0
    assert np.array_equal(np.asarray(t.row_best)[live_r], np.asarray(rbest)[live_r])
    assert np.array_equal(np.asarray(t.row_arg)[live_r], np.asarray(rarg)[live_r])
    assert np.all(np.asarray(t.row_best)[~live_r] > 256.0)
    live_s = live_r & (np.asarray(rsec) <= 256.0)
    assert np.array_equal(np.asarray(t.row_second)[live_s], np.asarray(rsec)[live_s])
    live_c = np.asarray(cbest) <= 256.0
    assert np.array_equal(np.asarray(t.col_best)[live_c], np.asarray(cbest)[live_c])
    assert np.array_equal(np.asarray(t.col_arg)[live_c], np.asarray(carg)[live_c])


def test_tables_no_mask():
    rng = np.random.default_rng(1)
    da, db, va, vb, *_ = _rand_case(rng, 256, 256)
    t = ph.match_tables(da, db, va, vb, interpret=True)
    rbest, rsec, rarg, cbest, carg = _dense_tables(da, db, va, vb, None)
    live = np.asarray(rbest) <= 256.0
    assert np.array_equal(np.asarray(t.row_best)[live], np.asarray(rbest)[live])
    assert np.array_equal(np.asarray(t.row_arg)[live], np.asarray(rarg)[live])
    live_c = np.asarray(cbest) <= 256.0
    assert np.array_equal(np.asarray(t.col_arg)[live_c], np.asarray(carg)[live_c])


def test_all_invalid_columns():
    rng = np.random.default_rng(2)
    da, db, va, _, *_ = _rand_case(rng, 256, 128)
    vb = jnp.zeros(128, bool)
    t = ph.match_tables(da, db, va, vb, interpret=True)
    assert np.all(np.asarray(t.row_best) > 256.0)  # nothing matchable
    assert np.all(np.asarray(t.row_arg) >= 0)
    assert np.all(np.asarray(t.row_arg) < 128)


def test_match_windowed_cpu_equals_dense_match():
    """The public fallback path must equal match() with the composed mask."""
    rng = np.random.default_rng(3)
    da, db, va, vb, xa, xb, rb, la, lb = _rand_case(rng, 256, 128)
    res = matching.match_windowed(
        da, db, va, vb, xy_a=xa, xy_b=xb, radius_b=rb,
        level_a=la, level_b=lb, lvl_lo=-1.0, lvl_hi=1.0,
        max_dist=50.0, ratio=0.9,
    )
    allowed = matching.window_mask_b(xa, xb, rb) & matching.level_mask(la, lb, -1, 1)
    ref = matching.match(da, db, va, vb, allowed=allowed, max_dist=50.0, ratio=0.9)
    assert np.array_equal(np.asarray(res.ok), np.asarray(ref.ok))
    ok = np.asarray(ref.ok)
    assert np.array_equal(np.asarray(res.idx)[ok], np.asarray(ref.idx)[ok])
