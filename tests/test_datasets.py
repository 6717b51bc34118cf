"""Dataset-loader coverage for every reference example driver's format
(SURVEY.md §2.4): TUM, KITTI, EuRoC/ETH, New College, AGZ, and the shipped
settings YAMLs."""

from pathlib import Path

import numpy as np
import pytest

from orbslamm_tpu.io.datasets import (
    load_agz_sequence,
    load_euroc_sequence,
    load_kitti_sequence,
    load_newcollege_sequence,
    load_tum_sequence,
)
from orbslamm_tpu.utils.config import load_settings

SETTINGS_DIR = Path(__file__).resolve().parents[1] / "examples" / "settings"


def test_shipped_settings_parse():
    files = sorted(SETTINGS_DIR.glob("*.yaml"))
    assert len(files) >= 10
    for f in files:
        cfg = load_settings(f)
        assert cfg.camera.fx > 100
        assert cfg.orb.n_features in (1000, 2000)
        assert cfg.orb.n_levels in (6, 8)
    kitti = load_settings(SETTINGS_DIR / "KITTI00-02.yaml")
    assert kitti.orb.n_features == 2000 and kitti.camera.fps == 10.0
    tum1 = load_settings(SETTINGS_DIR / "TUM1.yaml")
    assert abs(tum1.camera.fx - 517.306408) < 1e-6


def test_tum_loader(tmp_path):
    (tmp_path / "rgb").mkdir()
    (tmp_path / "rgb.txt").write_text(
        "# comment\n1.5 rgb/a.png\n2.5 rgb/b.png\n"
    )
    s = load_tum_sequence(tmp_path)
    assert len(s) == 2 and s.timestamps[1] == 2.5
    assert s.paths[0] == tmp_path / "rgb/a.png"


def test_kitti_loader(tmp_path):
    (tmp_path / "times.txt").write_text("0.0\n0.1\n0.2\n")
    s = load_kitti_sequence(tmp_path)
    assert len(s) == 3 and s.paths[2].name == "000002.png"


def test_euroc_loader_ns_timestamps(tmp_path):
    (tmp_path / "data").mkdir()
    (tmp_path / "data.csv").write_text(
        "#timestamp [ns],filename\n"
        "1403715273262142976,1403715273262142976.png\n"
        "1403715273312143104,1403715273312143104.png\n"
    )
    s = load_euroc_sequence(tmp_path)
    assert len(s) == 2
    assert abs(s.timestamps[0] - 1403715273.262142976) < 1e-3
    assert abs((s.timestamps[1] - s.timestamps[0]) - 0.05) < 1e-3
    assert s.paths[0].parent.name == "data"


def test_newcollege_loader(tmp_path):
    (tmp_path / "right").mkdir()
    (tmp_path / "times.txt").write_text("10.0\n10.1\n10.2\n")
    (tmp_path / "right" / "filenames.txt").write_text("a.png\nb.png\nc.png\n")
    s = load_newcollege_sequence(tmp_path)
    assert len(s) == 3 and s.paths[0] == tmp_path / "right" / "a.png"


def test_agz_loader_stride(tmp_path):
    (tmp_path / "MAVImages").mkdir()
    (tmp_path / "filenames.txt").write_text(
        "\n".join(f"img{i}.png" for i in range(12)) + "\n"
    )
    s = load_agz_sequence(tmp_path)  # reference strides by 5 (mono_AGZ.cc)
    assert len(s) == 3
    assert s.paths[1].name == "img5.png"
    assert np.allclose(s.timestamps, [0.0, 0.5, 1.0])
