"""CLI driver smoke test: a synthetic mini TUM RGB-D dataset on disk,
driven through the exact reference argv path (rgbd_tum.py -> run_dataset),
checking tracking state and trajectory output format (§2d parity:
Examples/RGB-D/rgbd_tum.cc shape — load list, System ctor, per-frame
Track with timing, save trajectory)."""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("PIL")

from orb_slam2_comment_tpu.utils import synthetic as syn

K = syn.DEFAULT_K


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def tum_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    scene = syn.make_scene(n_points=1400, seed=0)
    poses = syn.make_trajectory("jitter", n_frames=8, step=0.05)
    lines = []
    for i, f in enumerate(
        syn.render_sequence(scene, poses, K=K, depth=True)
    ):
        ts = f["timestamp"]
        rgb = np.clip(f["image"], 0, 255).astype(np.uint8)
        # TUM depth pngs are uint16 at 5000 units/m
        d16 = np.clip(f["depth"] * 5000.0, 0, 65535).astype(np.uint16)
        _write_png(root / "rgb" / f"{i}.png", rgb)
        _write_png(root / "depth" / f"{i}.png", d16)
        lines.append(f"{ts:.6f} rgb/{i}.png {ts:.6f} depth/{i}.png")
    (root / "associations.txt").write_text("\n".join(lines) + "\n")
    fx, fy, cx, cy = K
    (root / "settings.yaml").write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {fx}\nCamera.fy: {fy}\nCamera.cx: {cx}\nCamera.cy: {cy}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.bf: {fx * syn.DEFAULT_BASELINE}\n"
        "Camera.fps: 30.0\nCamera.RGB: 1\n"
        "Camera.width: 640\nCamera.height: 480\n"
        "ThDepth: 40.0\nDepthMapFactor: 5000.0\n"
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    return root


def test_rgbd_tum_driver(tum_dataset, tmp_path, monkeypatch):
    """Drive run_dataset exactly as rgbd_tum.py does and check the TUM
    trajectory file comes out (8 lines, 'ts tx ty tz qx qy qz qw')."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.run_dataset import run

    run(
        "rgbd", "tum_rgbd", str(tum_dataset),
        settings=str(tum_dataset / "settings.yaml"),
        vocabulary=None,
        associations=str(tum_dataset / "associations.txt"),
        out_prefix="CameraTrajectory",
    )
    out = tmp_path / "CameraTrajectory_tum.txt"
    assert out.exists(), "driver did not write the trajectory"
    rows = [l.split() for l in out.read_text().strip().splitlines()]
    assert len(rows) == 8, f"expected 8 trajectory rows, got {len(rows)}"
    for r in rows:
        assert len(r) == 8  # ts tx ty tz qx qy qz qw (TUM format)
        q = np.asarray([float(x) for x in r[4:]])
        assert abs(np.linalg.norm(q) - 1.0) < 1e-3
    # the jitter trajectory stays near the origin; translations should too
    t = np.asarray([[float(x) for x in r[1:4]] for r in rows])
    assert np.abs(t).max() < 1.0


def test_rgbd_tum_driver_warm_runs_prestaged(tum_dataset, tmp_path,
                                             monkeypatch):
    """--runs 2 + --prestage (the h2h warm-timing path): the second,
    timed run starts from a fresh System in the same process and must
    produce the IDENTICAL trajectory to a single cold run (determinism
    across in-process replays; frames pre-staged as device arrays)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.run_dataset import run

    common = dict(
        settings=str(tum_dataset / "settings.yaml"),
        vocabulary=None,
        associations=str(tum_dataset / "associations.txt"),
    )
    run("rgbd", "tum_rgbd", str(tum_dataset), out_prefix="cold", **common)
    run("rgbd", "tum_rgbd", str(tum_dataset), out_prefix="warm",
        runs=2, prestage=True, **common)
    cold = (tmp_path / "cold_tum.txt").read_text()
    warm = (tmp_path / "warm_tum.txt").read_text()
    assert cold == warm, "warm in-process replay diverged from cold run"


@pytest.fixture(scope="module")
def kitti_dataset(tmp_path_factory):
    """Synthetic KITTI-odometry-format stereo sequence on disk."""
    root = tmp_path_factory.mktemp("kitti_seq")
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()
    scene = syn.make_scene(n_points=1400, seed=0)
    poses = syn.make_trajectory("jitter", n_frames=6, step=0.05)
    times = []
    for i, f in enumerate(
        syn.render_sequence(scene, poses, K=K, stereo=True)
    ):
        _write_png(
            root / "image_0" / f"{i:06d}.png",
            np.clip(f["image"], 0, 255).astype(np.uint8),
        )
        _write_png(
            root / "image_1" / f"{i:06d}.png",
            np.clip(f["image_right"], 0, 255).astype(np.uint8),
        )
        times.append(f"{f['timestamp']:.6e}")
    (root / "times.txt").write_text("\n".join(times) + "\n")
    fx, fy, cx, cy = K
    (root / "settings.yaml").write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {fx}\nCamera.fy: {fy}\nCamera.cx: {cx}\nCamera.cy: {cy}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.bf: {fx * syn.DEFAULT_BASELINE}\n"
        "Camera.fps: 10.0\nCamera.RGB: 1\nThDepth: 35.0\n"
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    return root


def test_stereo_kitti_driver(kitti_dataset, tmp_path, monkeypatch):
    """stereo_kitti argv path: pre-rectified L/R pairs, KITTI-format
    trajectory out (12 numbers per row, Examples/Stereo/stereo_kitti.cc)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.run_dataset import run

    run(
        "stereo", "kitti", str(kitti_dataset),
        settings=str(kitti_dataset / "settings.yaml"),
        vocabulary=None,
        out_prefix="CameraTrajectory",
    )
    out = tmp_path / "CameraTrajectory_kitti.txt"
    assert out.exists()
    rows = [l.split() for l in out.read_text().strip().splitlines()]
    assert len(rows) == 6
    for r in rows:
        assert len(r) == 12  # 3x4 row-major pose
        M = np.asarray([float(x) for x in r]).reshape(3, 4)
        # rotation block must be orthonormal
        RtR = M[:, :3].T @ M[:, :3]
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)
