"""AR helpers (ViewerAR parity): plane RANSAC, cube geometry, overlay
rendering — pure numpy, no device needed."""

import numpy as np

from orb_slam2_comment_tpu.utils import ar


def _plane_cloud(n=200, noise=0.001, outliers=40, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n + outliers, 3))
    pts[:n, 0] = rng.uniform(-2, 2, n)
    pts[:n, 2] = rng.uniform(3, 8, n)
    pts[:n, 1] = 1.5 + rng.normal(0, noise, n)  # plane y = 1.5
    pts[n:] = rng.uniform(-3, 3, (outliers, 3)) + [0, 0, 5]
    return pts


def test_detect_plane_recovers_ground():
    Tcw = np.eye(4)
    res = ar.detect_plane(_plane_cloud(), Tcw, seed=1)
    assert res is not None
    nrm, origin = res
    assert abs(abs(nrm[1]) - 1.0) < 0.02  # normal ~ +/- y
    assert abs(origin[1] - 1.5) < 0.05
    # normal oriented toward the camera at the origin
    cam = np.zeros(3)
    assert (cam - origin) @ nrm > 0


def test_detect_plane_rejects_random_cloud():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-5, 5, (300, 3)) + [0, 0, 8]
    assert ar.detect_plane(pts, np.eye(4), seed=0) is None


def test_detect_plane_needs_points():
    assert ar.detect_plane(np.zeros((5, 3)), np.eye(4)) is None


def test_cube_sits_on_plane():
    nrm = np.array([0.0, -1.0, 0.0])
    org = np.array([0.5, 1.5, 5.0])
    v = ar.cube_vertices(org, nrm, size=0.4)
    assert v.shape == (8, 3)
    # base corners on the plane, top corners 0.4 above (along -y)
    assert np.allclose(v[:4, 1], 1.5, atol=1e-6)
    assert np.allclose(v[4:, 1], 1.1, atol=1e-6)


def test_render_cube_draws_pixels():
    img = np.full((240, 320), 128, np.uint8)
    Tcw = np.eye(4)
    K = (260.0, 260.0, 160.0, 120.0)
    out = ar.render_cube(img, Tcw, K, np.array([0.0, -1.0, 0.0]),
                         np.array([0.0, 0.5, 4.0]), size=0.6)
    assert out.shape == (240, 320, 3)
    green = (out[..., 1] == 255) & (out[..., 0] == 0)
    assert green.sum() > 50  # wireframe visible


def test_render_cube_behind_camera_safe():
    img = np.full((120, 160), 50, np.uint8)
    out = ar.render_cube(img, np.eye(4), (100.0, 100.0, 80.0, 60.0),
                         np.array([0.0, 0.0, 1.0]),
                         np.array([0.0, 0.0, -3.0]), size=0.5)
    assert out.shape == (120, 160, 3)  # no crash, nothing sensible to draw


def test_load_rectification_euroc_yaml(tmp_path):
    from orb_slam2_comment_tpu.utils.config import load_rectification

    yaml = """%YAML:1.0
Camera.fx: 435.2
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1, 0, 0, 0, 1, 0, 0, 0, 1]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.4, 0, 0, 435.2, 252.2, 0, 0, 0, 1, 0]
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.00001, 0.00002, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1, 0, 0, 0, 1, 0, 0, 0, 1]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.4, -47.9, 0, 435.2, 252.2, 0, 0, 0, 1, 0]
"""
    p = tmp_path / "euroc.yaml"
    p.write_text(yaml)
    rect = load_rectification(str(p))
    assert rect is not None
    K1, D1, R1, P1, K2, D2, R2, P2, hw = rect
    assert hw == (480, 752)
    assert K1.shape == (9,) and abs(K1[0] - 458.654) < 1e-9
    assert P2.shape == (12,) and abs(P2[3] + 47.9) < 1e-9

    # no blocks -> None
    p2 = tmp_path / "plain.yaml"
    p2.write_text("%YAML:1.0\nCamera.fx: 500.0\n")
    assert load_rectification(str(p2)) is None


def test_rectify_maps_identity_roundtrip():
    """With R=I, D=0 and P==K the rectification grid is the identity."""
    from orb_slam2_comment_tpu.utils import datasets as ds

    K = [100.0, 0, 80, 0, 100.0, 60, 0, 0, 1]
    D = [0.0, 0, 0, 0, 0]
    R = [1.0, 0, 0, 0, 1, 0, 0, 0, 1]
    P = [100.0, 0, 80, 0, 0, 100.0, 60, 0, 0, 0, 1, 0]
    (m1, m2) = ds.stereo_rectify_maps(K, D, R, P, K, D, R, P, (120, 160))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160)).astype(np.uint8)
    out = ds.remap(img, *m1)
    assert np.max(np.abs(out.astype(float) - img)) < 1.0
