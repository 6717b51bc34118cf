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
