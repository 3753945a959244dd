"""Visualization — the reference's Viewer/FrameDrawer/MapDrawer
(src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc) as offline matplotlib/numpy
renderers (Pangolin GUI parity is out of scope; SURVEY.md §7.11 allows a
lightweight viewer).

- annotate_frame: tracked/untracked keypoints over the image + status text
  (FrameDrawer::DrawFrame/DrawTextInfo, src/FrameDrawer.cc:38-166)
- plot_map: top-down map points, keyframe positions, covisibility edges,
  current camera (MapDrawer::DrawMapPoints/DrawKeyFrames,
  src/MapDrawer.cc:44-178)
"""

from __future__ import annotations

import numpy as np


def annotate_frame(image: np.ndarray, feats, assoc=None, state: int = 1,
                   n_kfs: int = 0, n_pts: int = 0) -> np.ndarray:
    """Returns an RGB uint8 image with keypoint overlays: green = tracked
    map point, blue = detected feature without association."""
    img = np.asarray(image)
    rgb = np.stack([img, img, img], axis=-1).astype(np.uint8)
    xy = np.asarray(feats.xy)
    valid = np.asarray(feats.valid)
    a = np.asarray(assoc) if assoc is not None else np.full(len(xy), -1)
    h, w = img.shape
    for i in np.where(valid)[0]:
        x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
        if not (2 <= x < w - 2 and 2 <= y < h - 2):
            continue
        color = (0, 220, 0) if a[i] >= 0 else (80, 80, 255)
        rgb[y - 2:y + 3, x - 2, :] = color
        rgb[y - 2:y + 3, x + 2, :] = color
        rgb[y - 2, x - 2:x + 3, :] = color
        rgb[y + 2, x - 2:x + 3, :] = color
    return rgb


def plot_map(map_state, trajectory=None, out_path: str = "map.png",
             title: str = ""):
    """Top-down (x-z) scatter of the map + keyframes + trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = map_state
    pts = np.asarray(m.pt_pos)
    pv = np.asarray(m.pt_valid)
    kf = np.asarray(m.kf_pose)
    kv = np.asarray(m.kf_valid)

    fig, ax = plt.subplots(figsize=(8, 8))
    if pv.any():
        ax.scatter(pts[pv, 0], pts[pv, 2], s=1, c="k", alpha=0.4,
                   label=f"{int(pv.sum())} map points")
    centers = []
    for i in np.where(kv)[0]:
        R, t = kf[i, :3, :3], kf[i, :3, 3]
        centers.append(-R.T @ t)
    if centers:
        c = np.stack(centers)
        ax.plot(c[:, 0], c[:, 2], "b.-", ms=4, lw=0.8,
                label=f"{len(c)} keyframes")
    if trajectory is not None and len(trajectory):
        tr = []
        for T in trajectory:
            T = np.asarray(T)
            tr.append(-T[:3, :3].T @ T[:3, 3])
        tr = np.stack(tr)
        ax.plot(tr[:, 0], tr[:, 2], "g-", lw=0.6, alpha=0.7, label="trajectory")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
