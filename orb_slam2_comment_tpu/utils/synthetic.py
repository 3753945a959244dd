"""Synthetic scene rendering with exact ground truth.

The reference validates end-to-end on TUM/KITTI/EuRoC (SURVEY.md §4); those
datasets are not available in this environment, so the test pyramid and
benchmarks run on synthetic scenes: a cloud of 3D landmarks rendered as
small high-contrast squares (FAST-detectable corners) over a textured
background, with exact ground-truth poses, depths, and stereo pairs.

Host-side numpy; used by tests, integration runs, and bench.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


_MAX_HALF = 7


@dataclass
class SyntheticScene:
    """A box of landmark 'markers' that render as uniquely-textured patches.

    Each marker stamps its own random texture so binary descriptors are
    discriminative across landmarks (uniform squares would collide)."""

    points: np.ndarray       # [M, 3] world positions
    texture: np.ndarray      # [M, 2*_MAX_HALF+1, 2*_MAX_HALF+1] pixel values
    half: np.ndarray         # [M] half-size (px) of the stamped patch
    background: float = 128.0


def make_scene(
    n_points: int = 1200,
    extent=(12.0, 8.0, 18.0),
    z_near: float = 2.0,
    seed: int = 0,
) -> SyntheticScene:
    r = np.random.default_rng(seed)
    pts = np.stack(
        [
            r.uniform(-extent[0], extent[0], n_points),
            r.uniform(-extent[1], extent[1], n_points),
            r.uniform(z_near, z_near + extent[2], n_points),
        ],
        axis=1,
    ).astype(np.float32)
    side = 2 * _MAX_HALF + 1
    # low-frequency unique textures: 5x5 random control grids bilinearly
    # upsampled, so descriptors stay stable under the ~1px parallax shifts
    # of stereo/multi-view rendering (per-pixel white noise decorrelates)
    low = r.uniform(0.0, 255.0, (n_points, 5, 5)).astype(np.float32)
    xs = np.linspace(0, 4, side)
    i0 = np.clip(xs.astype(int), 0, 3)
    w = (xs - i0).astype(np.float32)
    W = np.zeros((side, 5), np.float32)
    W[np.arange(side), i0] = 1 - w
    W[np.arange(side), i0 + 1] += w
    tex = np.einsum("ia,mab,jb->mij", W, low, W)
    half = r.integers(4, _MAX_HALF + 1, n_points).astype(np.int32)
    return SyntheticScene(points=pts, texture=tex, half=half)


def render(
    scene: SyntheticScene,
    Tcw: np.ndarray,
    K,
    hw=(480, 640),
    baseline: float = 0.0,
    noise: float = 1.0,
    seed: int = 0,
    depth_map: bool = False,
):
    """Render a grayscale frame (and optional depth map) from pose Tcw.

    baseline > 0 shifts the camera right by `baseline` meters (for the right
    image of a stereo pair).
    Returns image [H,W] float32 (and depth [H,W] float32 with 0 = no depth).
    """
    h, w = hw
    fx, fy, cx, cy = K
    r = np.random.default_rng(seed)
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    Xc = scene.points @ R.T + t
    if baseline != 0.0:
        # right camera of a rectified pair: Xc_right = Xc_left - [b, 0, 0]
        Xc = Xc - np.array([baseline, 0.0, 0.0], np.float32)
    vis = Xc[:, 2] > 0.25
    u = fx * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + cx
    v = fy * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + cy
    img = np.full((h, w), scene.background, np.float32)
    dep = np.zeros((h, w), np.float32)
    # painter's algorithm: far markers first so near ones overwrite
    order = np.argsort(-Xc[:, 2])
    for i in order:
        if not vis[i]:
            continue
        ui, vi = int(round(u[i])), int(round(v[i]))
        hf = int(scene.half[i])
        if ui - hf < 0 or ui + hf >= w or vi - hf < 0 or vi + hf >= h:
            continue
        img[vi - hf:vi + hf + 1, ui - hf:ui + hf + 1] = scene.texture[
            i, : 2 * hf + 1, : 2 * hf + 1
        ]
        dep[vi - hf:vi + hf + 1, ui - hf:ui + hf + 1] = Xc[i, 2]
    if noise > 0:
        img = img + r.normal(0, noise, img.shape).astype(np.float32)
        img = np.clip(img, 0, 255)
    if depth_map:
        return img, dep
    return img


def make_trajectory(kind: str = "forward", n_frames: int = 30, step: float = 0.06,
                    yaw_rate: float = 0.0, seed: int = 0):
    """Ground-truth world->camera pose sequence [N, 4, 4].

    'forward': translate along +z with optional yaw drift (KITTI-like).
    'orbit'  : circle the scene center (loop-closure-friendly).
    'jitter' : small random walk around origin (TUM-desk-like).
    """
    r = np.random.default_rng(seed)
    poses = []
    if kind == "forward":
        for i in range(n_frames):
            yaw = yaw_rate * i
            cz, sz = np.cos(yaw), np.sin(yaw)
            Rwc = np.array([[cz, 0, sz], [0, 1, 0], [-sz, 0, cz]], np.float32)
            twc = np.array([step * i * sz * 0.5, 0.0, step * i], np.float32)
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, :3] = Rwc.T
            Tcw[:3, 3] = -Rwc.T @ twc
            poses.append(Tcw)
    elif kind == "orbit":
        radius = 6.0
        center = np.array([0.0, 0.0, 10.0], np.float32)
        for i in range(n_frames):
            th = 2 * np.pi * i / n_frames
            pos = center + radius * np.array([np.sin(th), 0.0, -np.cos(th)], np.float32)
            # look at center
            z_axis = center - pos
            z_axis = z_axis / np.linalg.norm(z_axis)
            x_axis = np.cross([0.0, 1.0, 0.0], z_axis)
            x_axis = x_axis / np.linalg.norm(x_axis)
            y_axis = np.cross(z_axis, x_axis)
            Rwc = np.stack([x_axis, y_axis, z_axis], axis=1).astype(np.float32)
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, :3] = Rwc.T
            Tcw[:3, 3] = -Rwc.T @ pos
            poses.append(Tcw)
    elif kind == "jitter":
        pos = np.zeros(3, np.float32)
        yaw = 0.0
        for i in range(n_frames):
            pos = pos + r.normal(0, step / 2, 3).astype(np.float32) * [1, 0.3, 1]
            yaw += r.normal(0, 0.004)
            cz, sz = np.cos(yaw), np.sin(yaw)
            Rwc = np.array([[cz, 0, sz], [0, 1, 0], [-sz, 0, cz]], np.float32)
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, :3] = Rwc.T
            Tcw[:3, 3] = -Rwc.T @ pos
            poses.append(Tcw)
    else:
        raise ValueError(kind)
    return np.stack(poses)


DEFAULT_K = (520.0, 520.0, 320.0, 240.0)
DEFAULT_HW = (480, 640)
DEFAULT_BASELINE = 0.3


def render_sequence(scene, poses, K=DEFAULT_K, hw=DEFAULT_HW, stereo=False,
                    baseline=DEFAULT_BASELINE, depth=False, noise=1.0):
    """Yield per-frame dicts with image(s)/depth and ground truth pose."""
    for i, Tcw in enumerate(poses):
        out = {"Tcw_gt": Tcw, "timestamp": i / 20.0}
        if stereo:
            out["image"] = render(scene, Tcw, K, hw, noise=noise, seed=100 + i)
            out["image_right"] = render(
                scene, Tcw, K, hw, baseline=baseline, noise=noise, seed=200 + i
            )
        elif depth:
            img, dep = render(scene, Tcw, K, hw, noise=noise, seed=100 + i, depth_map=True)
            out["image"], out["depth"] = img, dep
        else:
            out["image"] = render(scene, Tcw, K, hw, noise=noise, seed=100 + i)
        yield out
