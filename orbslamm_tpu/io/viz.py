"""Headless map/frame rendering — the Pangolin Viewer/MapDrawer/FrameDrawer
analog (SURVEY.md §2.1 Viewer/FrameDrawer/MapDrawer), producing PNG files
instead of a GL window: map points, keyframe frusta, covisibility edges,
current camera, and a per-frame keypoint overlay with the status HUD.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from orbslamm_tpu.models import map_state as ms


def _centers(poses):
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    return -np.einsum("nji,nj->ni", R, t)


def draw_map(
    m: ms.MapState,
    path: str | Path,
    trajectory: np.ndarray | None = None,
    title: str = "orbslamm_tpu map",
    show_covisibility: bool = True,
) -> None:
    """Top-down (x-z) map rendering: landmarks, keyframes, covisibility."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kv = np.asarray(m.kf_valid)
    lv = np.asarray(m.lm_valid)
    pts = np.asarray(m.lm_pos)[lv]
    poses = np.asarray(m.kf_pose)[kv]
    C = _centers(poses) if len(poses) else np.zeros((0, 3))

    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="#777777", alpha=0.5, label="landmarks")
    if show_covisibility and kv.sum() > 1:
        W = np.asarray(ms.covisibility(m))
        idx = np.nonzero(kv)[0]
        for a_i, a in enumerate(idx):
            for b_i, b in enumerate(idx):
                if b <= a:
                    continue
                if W[a, b] >= 30:
                    ax.plot(
                        [C[a_i, 0], C[b_i, 0]], [C[a_i, 2], C[b_i, 2]],
                        c="#88bb88", lw=0.5, alpha=0.6,
                    )
    if len(C):
        ax.plot(C[:, 0], C[:, 2], "b.-", ms=4, lw=0.8, label="keyframes")
    if trajectory is not None and len(trajectory):
        Ct = _centers(np.asarray(trajectory))
        ax.plot(Ct[:, 0], Ct[:, 2], "r-", lw=0.6, alpha=0.7, label="frames")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_title(f"{title} — {int(kv.sum())} KFs, {int(lv.sum())} landmarks")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def draw_frame(
    image: np.ndarray,
    feats,
    feat_lm: np.ndarray | None,
    path: str | Path,
    status: str = "",
) -> None:
    """Current frame with keypoints (green = tracked landmark, blue = free)
    and a status bar — the FrameDrawer::DrawFrame analog."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy_raw)[valid]
    tracked = (
        (np.asarray(feat_lm)[valid] >= 0) if feat_lm is not None else np.zeros(len(xy), bool)
    )
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(image, cmap="gray", vmin=0, vmax=255)
    ax.scatter(xy[~tracked, 0], xy[~tracked, 1], s=6, facecolors="none",
               edgecolors="#4488ff", lw=0.7)
    ax.scatter(xy[tracked, 0], xy[tracked, 1], s=6, facecolors="none",
               edgecolors="#33dd33", lw=0.9)
    ax.set_title(status or f"{int(valid.sum())} keypoints, {int(tracked.sum())} tracked")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
