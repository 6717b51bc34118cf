"""Dataset loaders — TUM RGB-D (monocular stream) and KITTI odometry.

Formats match the reference's example drivers (SURVEY.md §2.4):
  * TUM:   ``<seq>/rgb.txt`` lines ``timestamp filename`` (mono_tum.cc LoadImages)
  * KITTI: ``<seq>/times.txt`` + ``<seq>/image_0/%06d.png`` (mono_kitti.cc)

Images are decoded host-side to grayscale uint8 — the ingestion path feeding
the jitted pipeline. Decoding uses OpenCV when available, else PIL.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np


def imread_gray(path: str | Path) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"))


@dataclass
class ImageSequence:
    paths: list[Path]
    timestamps: np.ndarray  # [T] float64
    name: str = ""

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[tuple[float, np.ndarray]]:
        for ts, p in zip(self.timestamps, self.paths):
            yield float(ts), imread_gray(p)

    def frame(self, i: int) -> np.ndarray:
        return imread_gray(self.paths[i])

    def prefetched(self, height: int, width: int, lookahead: int = 8):
        """Iterate (timestamp, gray) with the native C++ prefetching decoder
        (native/frame_loader.cc) when available, else the Python decoder."""
        try:
            from orbslamm_tpu.io.native import NativeFrameLoader, native_available

            if native_available():
                loader = NativeFrameLoader(self.paths, height, width, lookahead)
                for ts, img in zip(self.timestamps, loader):
                    yield float(ts), img
                return
        except Exception:
            pass
        yield from iter(self)


def load_tum_sequence(seq_dir: str | Path) -> ImageSequence:
    seq_dir = Path(seq_dir)
    paths: list[Path] = []
    stamps: list[float] = []
    for line in (seq_dir / "rgb.txt").read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        ts, rel = line.split()[:2]
        stamps.append(float(ts))
        paths.append(seq_dir / rel)
    return ImageSequence(paths, np.asarray(stamps), name=seq_dir.name)


def load_kitti_sequence(seq_dir: str | Path, camera: int = 0) -> ImageSequence:
    seq_dir = Path(seq_dir)
    stamps = np.asarray(
        [float(x) for x in (seq_dir / "times.txt").read_text().split()], np.float64
    )
    img_dir = seq_dir / f"image_{camera}"
    paths = [img_dir / f"{i:06d}.png" for i in range(len(stamps))]
    return ImageSequence(paths, stamps, name=seq_dir.name)


def load_euroc_sequence(seq_dir: str | Path) -> ImageSequence:
    """EuRoC/ETH camera folder: ``<seq>/data.csv`` lines ``t_ns,filename``
    with images under ``<seq>/data/`` (mono_eth.cc LoadImages + :70).
    Nanosecond timestamps are converted to seconds."""
    seq_dir = Path(seq_dir)
    paths: list[Path] = []
    stamps: list[float] = []
    # The reference keeps raw timestamp values as-is (mono_eth.cc LoadImages);
    # we deliberately normalize to seconds, deciding the unit ONCE from the
    # first valid row so a whole file is never mixed-unit.
    ns_scale: float | None = None
    for line in (seq_dir / "data.csv").read_text().splitlines()[1:]:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        t_str, name = [x.strip() for x in line.split(",")[:2]]
        t = float(t_str)
        if ns_scale is None:
            ns_scale = 1e-9 if t > 1e14 else 1.0
        stamps.append(t * ns_scale)
        paths.append(seq_dir / "data" / name)
    return ImageSequence(paths, np.asarray(stamps), name=seq_dir.name)


def load_newcollege_sequence(seq_dir: str | Path) -> ImageSequence:
    """New College: ``<seq>/times.txt`` + ``<seq>/right/filenames.txt``
    (mono_NewCollege.cc:127-157)."""
    seq_dir = Path(seq_dir)
    # zip the two files line-by-line (as the reference's paired getline loop
    # does): a blank line in only one file must not shift the pairing of all
    # subsequent frames
    stamps: list[float] = []
    paths: list[Path] = []
    t_lines = (seq_dir / "times.txt").read_text().splitlines()
    f_lines = (seq_dir / "right" / "filenames.txt").read_text().splitlines()
    for t_line, f_line in zip(t_lines, f_lines):
        if not t_line.strip() or not f_line.strip():
            continue
        stamps.append(float(t_line.split()[0]))
        paths.append(seq_dir / "right" / f_line.split()[0])
    return ImageSequence(paths, np.asarray(stamps), name=seq_dir.name)


def load_agz_sequence(seq_dir: str | Path, stride: int = 5) -> ImageSequence:
    """AGZ (Zurich urban MAV): ``<seq>/filenames.txt`` naming images in
    ``<seq>/MAVImages/``; synthetic 10 Hz timestamps, every ``stride``-th
    frame processed (mono_AGZ.cc LoadImages + main loop ``ni+=5``)."""
    seq_dir = Path(seq_dir)
    names = [
        s.split()[0]
        for s in (seq_dir / "filenames.txt").read_text().splitlines()
        if s.strip()
    ]
    paths = [seq_dir / "MAVImages" / n for n in names]
    stamps = np.arange(len(paths), dtype=np.float64) * 0.1
    return ImageSequence(paths[::stride], stamps[::stride], name=seq_dir.name)


def video_capture_frames(source: int | str, max_frames: int = 0):
    """Live-camera ingestion: yields (timestamp, gray) from an OpenCV
    ``VideoCapture`` (device index or file/URL). This is the mono_Bebop.cc:56
    path — the Bebop H.264→FIFO→v4l2loopback plumbing (SettingUpBebop/,
    Thirdparty/v4l2loopback/) collapses to whatever V4L2 device OpenCV sees."""
    import time

    import cv2  # gated: live capture requires OpenCV

    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise RuntimeError(f"could not open video source {source!r}")
    n = 0
    try:
        while not max_frames or n < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if frame.ndim == 3:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            yield time.monotonic(), frame
            n += 1
    finally:
        cap.release()
