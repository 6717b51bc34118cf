import numpy as np
import jax.numpy as jnp
import pytest

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.ops import bow, orb as orb_ops
from orbslamm_tpu.utils.config import CameraConfig, OrbConfig


@pytest.fixture(scope="module")
def voc_and_frames():
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120)
    seq = make_sequence(n_frames=12, n_points=900, cam=cam, seed=3, motion="orbit")
    ext = orb_ops.make_extractor(OrbConfig(n_features=300, max_keypoints=512, n_levels=4), cam)
    frames = [ext(jnp.asarray(img)) for img in seq.images]
    train = np.concatenate([np.asarray(f.desc)[np.asarray(f.valid)] for f in frames[:6]])
    voc = bow.build_vocabulary(train, branching=8, depth=3, iters=5)
    return voc, frames


def test_vocabulary_shape(voc_and_frames):
    voc, _ = voc_and_frames
    assert voc.n_words == 512
    assert voc.nodes.shape == (8 + 64 + 512, 32)


def test_word_assignment_deterministic(voc_and_frames):
    voc, frames = voc_and_frames
    f = frames[0]
    w1 = bow.assign_words(voc, f.desc, f.valid)
    w2 = bow.assign_words(voc, f.desc, f.valid)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    w = np.asarray(w1)
    assert (w[np.asarray(f.valid)] >= 0).all()
    assert (w[~np.asarray(f.valid)] == -1).all()
    # words spread across the vocabulary
    assert len(np.unique(w[w >= 0])) > 50


def test_bow_recognizes_revisited_viewpoint(voc_and_frames):
    """A re-visit of (nearly) the same viewpoint — the loop-closure event —
    must score far above an unrelated scene. (Wide-baseline place
    recognition is limited by synthetic sprite descriptors, so the contract
    tested here is the one loop closing actually relies on: recognize the
    same place seen again from a similar pose.)"""
    voc, frames = voc_and_frames
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120)
    ext = orb_ops.make_extractor(
        OrbConfig(n_features=300, max_keypoints=512, n_levels=4), cam
    )
    # re-render frame 0's viewpoint with different image noise (a revisit)
    from orbslamm_tpu.io.synthetic import make_landmark_field, make_stamps, render_view
    import numpy as _np
    seq = make_sequence(n_frames=2, n_points=900, cam=cam, seed=3, motion="orbit")
    pts = make_landmark_field(900, seed=3)
    stamps = make_stamps(900, seed=103)
    rngb = _np.random.default_rng(1234)
    bright = _np.random.default_rng(3).uniform(120, 255, 900).astype(_np.float32)
    revisit_img = render_view(pts, seq.poses_cw[0], cam, bright, stamps=stamps, rng=rngb)
    f_rev = ext(jnp.asarray(revisit_img))
    v0 = bow.bow_vector(voc, bow.assign_words(voc, frames[0].desc, frames[0].valid))
    v_rev = bow.bow_vector(voc, bow.assign_words(voc, f_rev.desc, f_rev.valid))
    s_rev = float(bow.bow_score(v0, v_rev))

    other = make_sequence(n_frames=1, n_points=900, cam=cam, seed=99)
    fo = ext(jnp.asarray(other.images[0]))
    v_other = bow.bow_vector(voc, bow.assign_words(voc, fo.desc, fo.valid))
    s_other = float(bow.bow_score(v0, v_other))
    assert s_rev > s_other * 1.3, f"revisit {s_rev} vs other-place {s_other}"


def test_batched_database_scoring(voc_and_frames):
    voc, frames = voc_and_frames
    vecs = jnp.stack(
        [bow.bow_vector(voc, bow.assign_words(voc, f.desc, f.valid)) for f in frames]
    )
    scores = np.asarray(bow.bow_score(vecs[0], vecs))
    assert scores.shape == (len(frames),)
    assert scores[0] > 0.99
    assert scores.argmax() == 0
