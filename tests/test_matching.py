import numpy as np
import jax.numpy as jnp
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.ops import matching as m
from orbslamm_tpu.ops import orb as orb_ops
from orbslamm_tpu.utils.config import CameraConfig, OrbConfig


def np_hamming(a, b):
    return np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=-1).sum(-1)


def test_hamming_matrix_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (37, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (53, 32), dtype=np.uint8)
    D = np.asarray(m.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(D.astype(np.int64), np_hamming(a, b))


def test_match_identity():
    rng = np.random.default_rng(1)
    d = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    valid = jnp.ones(64, bool)
    res = m.match(jnp.asarray(d), jnp.asarray(d), valid, valid, max_dist=10)
    assert bool(res.ok.all())
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(64))
    assert float(res.dist.max()) == 0.0


def test_match_respects_validity_and_threshold():
    rng = np.random.default_rng(2)
    d1 = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    d2 = rng.integers(0, 256, (16, 32), dtype=np.uint8)  # unrelated → dist ~128
    va = jnp.ones(16, bool)
    vb = jnp.ones(16, bool).at[3].set(False)
    res = m.match(jnp.asarray(d1), jnp.asarray(d2), va, vb, max_dist=50)
    assert not bool(res.ok.any())  # random descriptors exceed threshold
    res2 = m.match(jnp.asarray(d1), jnp.asarray(d1), va, vb, max_dist=50)
    assert not bool(res2.ok[3])  # can't match invalid target... (self-row masked)


def test_window_mask():
    a = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    b = jnp.asarray([[1.0, 1.0], [50.0, 50.0]])
    w = np.asarray(m.window_mask(a, b, 5.0))
    assert w[0, 0] and not w[0, 1] and not w[1, 0]
    # per-row radius
    w2 = np.asarray(m.window_mask(a, b, jnp.asarray([0.5, 45.0])))
    assert not w2[0, 0] and w2[1, 1]


def test_mutual_and_duplicates():
    # two A descriptors both closest to the same B; mutual keeps only best
    base = np.zeros((1, 32), np.uint8)
    a = np.concatenate([base, base], 0).copy()
    a[1, 0] = 1  # A1 at distance 1 from B0
    b = base
    va = jnp.ones(2, bool)
    vb = jnp.ones(1, bool)
    res = m.match(jnp.asarray(a), jnp.asarray(b), va, vb, max_dist=50)
    assert bool(res.ok.all())
    dedup = m.resolve_duplicates(res, 1)
    assert bool(dedup.ok[0]) and not bool(dedup.ok[1])


def test_rotation_consistency_rejects_outliers():
    rng = np.random.default_rng(3)
    d = rng.integers(0, 256, (100, 32), dtype=np.uint8)
    valid = jnp.ones(100, bool)
    ang_a = jnp.zeros(100)
    # 90 matches rotated by 0.5 rad, 10 outliers at random rotations
    ang_b = np.full(100, -0.5)
    ang_b[:10] = rng.uniform(1.0, 5.0, 10)
    res = m.match(
        jnp.asarray(d), jnp.asarray(d), valid, valid,
        max_dist=10, angles_a=ang_a, angles_b=jnp.asarray(ang_b),
    )
    ok = np.asarray(res.ok)
    assert ok[10:].all()
    assert not ok[:10].any()


def test_match_synthetic_frames_geometric_consistency():
    """Match features of two consecutive synthetic frames; verify matches
    agree with ground-truth optical flow."""
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120)
    seq = make_sequence(n_frames=10, n_points=1200, cam=cam, seed=9)
    ext = orb_ops.make_extractor(OrbConfig(n_features=300, max_keypoints=512, n_levels=4), cam)
    f1 = ext(jnp.asarray(seq.images[0]))
    f2 = ext(jnp.asarray(seq.images[1]))
    allowed = m.window_mask(f1.xy_raw, f2.xy_raw, 40.0)
    res = m.match(
        f1.desc, f2.desc, f1.valid, f2.valid, allowed=allowed,
        max_dist=64, ratio=0.9, mutual=True,
    )
    ok = np.asarray(res.ok)
    assert ok.sum() > 60, f"too few matches: {ok.sum()}"

    # epipolar check against the ground-truth relative pose: for a correct
    # match, x2' F x1 = 0 regardless of depth (Sampson distance in px)
    K = seq.K
    T1, T2 = seq.poses_cw[0], seq.poses_cw[1]
    T21 = T2 @ np.linalg.inv(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    Kinv = np.linalg.inv(K)
    F = Kinv.T @ E @ Kinv

    xy1 = np.asarray(f1.xy_raw)
    xy2 = np.asarray(f2.xy_raw)
    idx = np.asarray(res.idx)
    a = np.nonzero(ok)[0]
    p1 = np.concatenate([xy1[a], np.ones((len(a), 1))], 1)
    p2 = np.concatenate([xy2[idx[a]], np.ones((len(a), 1))], 1)
    Fx1 = p1 @ F.T
    Ftx2 = p2 @ F
    num = np.sum(p2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    sampson = num / np.maximum(den, 1e-12)
    inlier = sampson < 4.0  # 2px epipolar band
    # the matcher stage is not expected to be pure — downstream RANSAC and
    # pose optimization reject the tail (as in the reference) — but the
    # majority must be geometrically correct
    assert inlier.sum() > 35, f"epipolar inliers {inlier.sum()}/{len(a)}"
    assert inlier.mean() > 0.6, f"epipolar consistency {inlier.sum()}/{len(a)}"
