import numpy as np
import jax.numpy as jnp
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.ops import orb as orb_ops
from orbslamm_tpu.utils.config import CameraConfig, OrbConfig


CAM = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120)
ORB = OrbConfig(n_features=300, max_keypoints=512, n_levels=4)


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=3, n_points=1200, cam=CAM, seed=5)


@pytest.fixture(scope="module")
def extractor():
    return orb_ops.make_extractor(ORB, CAM)


def test_extract_basic(seq, extractor):
    feats = extractor(jnp.asarray(seq.images[0]))
    n = int(feats.valid.sum())
    assert n > 150, f"too few features: {n}"
    assert feats.xy.shape == (512, 2)
    assert feats.desc.shape == (512, 32)
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < CAM.width
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < CAM.height


def test_flat_image_no_features(extractor):
    img = jnp.full((240, 320), 128, jnp.uint8)
    feats = extractor(img)
    assert int(feats.valid.sum()) == 0


def test_determinism(seq, extractor):
    f1 = extractor(jnp.asarray(seq.images[0]))
    f2 = extractor(jnp.asarray(seq.images[0]))
    np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
    np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))


def test_fast_score_matches_cv2_corners(seq):
    """Level-0 FAST corners should substantially agree with OpenCV's FAST."""
    cv2 = pytest.importorskip("cv2")
    img = seq.images[0]
    score = np.asarray(orb_ops.fast_score(jnp.asarray(img)))
    ours = score > 20.0

    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps = det.detect(img, None)
    cv_mask = np.zeros_like(ours)
    for kp in kps:
        x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
        cv_mask[y, x] = True
    # ignore borders where padding semantics differ
    inner = np.zeros_like(ours)
    inner[8:-8, 8:-8] = True
    both = ours & cv_mask & inner
    cv_total = (cv_mask & inner).sum()
    assert cv_total > 50
    recall = both.sum() / cv_total
    assert recall > 0.9, f"FAST agreement too low: {recall:.2f}"


def test_keypoint_spread(seq, extractor):
    feats = extractor(jnp.asarray(seq.images[0]))
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy_raw)[v]
    # occupancy of a coarse 8x8 grid should be wide
    gx = np.clip((xy[:, 0] / CAM.width * 8).astype(int), 0, 7)
    gy = np.clip((xy[:, 1] / CAM.height * 8).astype(int), 0, 7)
    occupied = len(set(zip(gx.tolist(), gy.tolist())))
    assert occupied > 20, f"keypoints clustered: {occupied}/64 cells"


def test_descriptor_rotation_invariance():
    """Descriptors should be stable under in-plane rotation (oriented BRIEF).

    Uses a textured random field — point-sprite blobs are radially symmetric,
    which makes the intensity-centroid orientation (correctly) undefined.
    """
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)
    img = cv2.GaussianBlur(rng.uniform(0, 255, (240, 320)).astype(np.float32), (0, 0), 2.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    angle_deg = 20.0
    M = cv2.getRotationMatrix2D((CAM.width / 2, CAM.height / 2), angle_deg, 1.0)
    rot = cv2.warpAffine(img, M, (CAM.width, CAM.height))

    ext = orb_ops.make_extractor(ORB, CAM)
    f1 = ext(jnp.asarray(img))
    f2 = ext(jnp.asarray(rot))
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    xy1 = np.asarray(f1.xy_raw)[v1]
    d1 = np.asarray(f1.desc)[v1]
    l1 = np.asarray(f1.level)[v1]
    xy2 = np.asarray(f2.xy_raw)[v2]
    d2 = np.asarray(f2.desc)[v2]
    l2 = np.asarray(f2.level)[v2]
    # map f1 keypoints into the rotated image, find close same-octave pairs
    ones = np.ones((len(xy1), 1))
    xy1r = np.concatenate([xy1, ones], 1) @ M.T  # [N,2]
    dists = np.linalg.norm(xy1r[:, None, :] - xy2[None, :, :], axis=-1)
    i, j = np.nonzero((dists < 1.5) & (l1[:, None] == l2[None, :]))
    assert len(i) > 30, f"too few correspondences: {len(i)}"
    ham = np.unpackbits(d1[i] ^ d2[j], axis=1).sum(1)
    med = np.median(ham)
    # random descriptor pairs have median ~128
    rand = np.unpackbits(d1[: len(d2)] ^ d2[np.random.permutation(len(d2))[: len(d1)]][: len(d1)], axis=1).sum(1)
    assert med < 55, f"rotated-descriptor Hamming median too high: {med}"
    assert np.median(rand) > 90


def test_level_feature_counts():
    counts = orb_ops.level_feature_counts(1000, 8, 1.2)
    assert sum(counts) == 1000
    assert counts[0] > counts[-1]
