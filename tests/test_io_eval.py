import numpy as np
import pytest

from orbslamm_tpu.eval.ate import associate, ate_from_poses, ate_rmse
from orbslamm_tpu.io import trajectory as tio
from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.utils.config import CameraConfig, SlamConfig, load_settings


def test_opencv_yaml_settings(tmp_path):
    p = tmp_path / "KITTI00.yaml"
    p.write_text(
        "%YAML:1.0\n\n"
        "Camera.fx: 718.856\nCamera.fy: 718.856\nCamera.cx: 607.1928\n"
        "Camera.cy: 185.2157\nCamera.k1: 0.0\nCamera.fps: 10.0\nCamera.RGB: 1\n"
        "# ORB Extractor\nORBextractor.nFeatures: 2000\n"
        "ORBextractor.scaleFactor: 1.2\nORBextractor.nLevels: 8\n"
        "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n"
    )
    cfg = load_settings(p)
    assert cfg.camera.fx == pytest.approx(718.856)
    assert cfg.camera.fps == 10.0
    assert cfg.orb.n_features == 2000
    assert cfg.orb.max_keypoints >= 2000
    assert cfg.tracking.new_kf_max_frames == 10


def test_default_config_capacities():
    cfg = SlamConfig()
    assert cfg.capacity.max_keyframes >= 256
    assert cfg.matcher.th_low == 50 and cfg.matcher.th_high == 100


def test_trajectory_tum_roundtrip(tmp_path):
    seq = make_sequence(n_frames=5, n_points=50, cam=CameraConfig(width=64, height=48))
    f = tmp_path / "traj.txt"
    tio.save_tum(f, seq.timestamps, seq.poses_cw)
    ts, tq = tio.load_tum(f)
    np.testing.assert_allclose(ts, seq.timestamps, atol=1e-5)
    # positions should equal camera centers
    R = seq.poses_cw[:, :3, :3]
    t = seq.poses_cw[:, :3, 3]
    centers = -np.einsum("nij,nj->ni", np.transpose(R, (0, 2, 1)), t)
    np.testing.assert_allclose(tq[:, :3], centers, atol=1e-5)


def test_trajectory_kitti_roundtrip(tmp_path):
    seq = make_sequence(n_frames=4, n_points=50, cam=CameraConfig(width=64, height=48))
    f = tmp_path / "kitti.txt"
    tio.save_kitti(f, seq.poses_cw)
    poses_wc = tio.load_kitti(f)
    for T_cw, T_wc in zip(seq.poses_cw, poses_wc):
        np.testing.assert_allclose(T_wc[:3, :3], T_cw[:3, :3].T, atol=1e-6)


def test_associate():
    a = np.array([0.0, 0.1, 0.2, 0.5])
    b = np.array([0.01, 0.11, 0.3, 0.49])
    ia, ib = associate(a, b, max_dt=0.02)
    assert list(ia) == [0, 1, 3]
    assert list(ib) == [0, 1, 3]


def test_ate_zero_for_identical():
    seq = make_sequence(n_frames=8, n_points=50, cam=CameraConfig(width=64, height=48))
    assert ate_from_poses(seq.poses_cw, seq.poses_cw) < 1e-6


def test_ate_sim3_invariance():
    """ATE with Sim3 alignment is invariant to a global scaled rigid warp."""
    rng = np.random.default_rng(3)
    gt = rng.normal(size=(40, 3))
    # warp: scale 3, rotation, translation
    from orbslamm_tpu.ops import geometry as geo
    import jax.numpy as jnp

    R = np.asarray(geo.so3_exp(jnp.asarray([0.3, -0.2, 0.9], jnp.float32)))
    est = 3.0 * gt @ R.T + np.array([4.0, 5.0, -1.0])
    assert ate_rmse(est, gt, align="sim3") < 1e-5
    assert ate_rmse(est, gt, align="se3") > 1.0


def test_synthetic_sequence_renders_features():
    seq = make_sequence(n_frames=3, n_points=800)
    # images contain actual structure: many bright blobs
    assert (seq.images[0] > 100).sum() > 500
    # consecutive frames differ but not wildly
    d = np.abs(seq.images[0].astype(int) - seq.images[1].astype(int)).mean()
    assert 0.1 < d < 60


def test_synthetic_kidnap():
    seq = make_sequence(n_frames=6, n_points=500, kidnap_at=3)
    c_before = -seq.poses_cw[2, :3, :3].T @ seq.poses_cw[2, :3, 3]
    c_after = -seq.poses_cw[3, :3, :3].T @ seq.poses_cw[3, :3, 3]
    assert np.linalg.norm(c_after - c_before) > 30
    # still sees structure after the kidnap
    assert (seq.images[4] > 100).sum() > 300
