"""Native I/O runtime (csrc/slamio.cc): PNG codec, prefetcher, vocabulary
parser — exercised against PIL and the pure-Python parser as references."""

import io
import os

import numpy as np
import pytest

from orb_slam2_comment_tpu._native import slamio

pytestmark = pytest.mark.skipif(
    slamio is None, reason="native slamio extension unavailable"
)


def _png_bytes(arr):
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="PNG")
    return b.getvalue()


def test_decode_png_gray8_roundtrip():
    a = (np.random.RandomState(0).rand(48, 64) * 255).astype(np.uint8)
    d = slamio.decode_png(_png_bytes(a))
    assert d.dtype == np.uint8 and np.array_equal(d, a)


def test_decode_png_gray16_raw_values():
    # TUM depth maps are 16-bit gray; values must come back untouched
    a = (np.random.RandomState(1).rand(32, 40) * 65535).astype(np.uint16)
    d = slamio.decode_png(_png_bytes(a))
    assert d.dtype == np.uint16 and np.array_equal(d, a)


def test_decode_png_rgb_roundtrip():
    a = (np.random.RandomState(2).rand(20, 30, 3) * 255).astype(np.uint8)
    d = slamio.decode_png(_png_bytes(a))
    assert d.shape == (20, 30, 3) and np.array_equal(d, a)


def test_read_image_gray_matches_itu601(tmp_path):
    from PIL import Image

    rgb = (np.random.RandomState(3).rand(24, 36, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(rgb).save(p)
    g = slamio.read_image(p, kind=0)
    ref = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    assert g.dtype == np.float32
    assert np.max(np.abs(g - ref)) < 0.51  # PIL rounds; we keep float


def test_read_image_errors_on_missing():
    with pytest.raises(IOError):
        slamio.read_image("/nonexistent/file.png")


def test_prefetcher_matches_sync_reads(tmp_path):
    from PIL import Image

    paths = []
    for i in range(10):
        img = (np.random.RandomState(i).rand(16, 24) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    pf = slamio.Prefetcher([[(p, 2)] for p in paths], lookahead=3, threads=2)
    assert pf.size() == 10
    for i in range(10):
        (got,) = pf.get(i)
        ref = slamio.read_image(paths[i], kind=2)
        assert np.array_equal(got, ref)


def test_prefetcher_multi_plane_rgbd(tmp_path):
    from PIL import Image

    specs = []
    for i in range(4):
        rgb = (np.random.RandomState(i).rand(16, 24) * 255).astype(np.uint8)
        dep = (np.random.RandomState(100 + i).rand(16, 24) * 9000).astype(
            np.uint16
        )
        pi = str(tmp_path / f"rgb{i}.png")
        pd = str(tmp_path / f"d{i}.png")
        Image.fromarray(rgb).save(pi)
        Image.fromarray(dep).save(pd)
        specs.append([(pi, 2), (pd, 1)])
    pf = slamio.Prefetcher(specs, lookahead=2, threads=2)
    img, dep = pf.get(2)
    assert img.dtype == np.uint8 and dep.dtype == np.uint16


def test_vocab_text_roundtrip(tmp_path):
    """train -> save upstream text format -> native parse -> same behavior."""
    from orb_slam2_comment_tpu.ops import bow

    def pack(u8):
        u = u8.reshape(u8.shape[0], 8, 4).astype(np.uint32)
        return u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16) | (u[..., 3] << 24)

    rng = np.random.RandomState(0)
    descs = pack(rng.randint(0, 256, size=(400, 32)).astype(np.uint8))
    voc = bow.train_vocabulary(descs, k=4, depth=3, seed=0)
    p = str(tmp_path / "voc.txt")
    bow.save_orb_vocab_text(p, voc)

    # native parse agrees with the pure-Python tokenizer
    kn, Ln, par_n, leaf_n, desc_n, w_n = slamio.parse_orb_vocab(p)
    kp, Lp, par_p, leaf_p, desc_p, w_p = bow._parse_orb_vocab_py(p)
    assert (kn, Ln) == (kp, Lp)
    assert np.array_equal(par_n, par_p)
    assert np.array_equal(leaf_n, leaf_p)
    assert np.array_equal(desc_n, desc_p)
    assert np.allclose(w_n, w_p)

    # loaded vocabulary produces identical BoW transforms
    voc2 = bow.load_orb_vocab(p, levels_up=1)  # train_vocabulary default
    import jax.numpy as jnp

    packed = jnp.asarray(pack(rng.randint(0, 256, size=(64, 32)).astype(np.uint8)))
    valid = jnp.ones(64, bool)
    w1, g1, v1 = bow.transform(voc, packed, valid)
    w2, g2, v2 = bow.transform(voc2, packed, valid)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(g1), np.asarray(g2))
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_dataset_loaders_use_native(tmp_path):
    from PIL import Image

    from orb_slam2_comment_tpu.utils import datasets as ds

    rgb = (np.random.RandomState(5).rand(16, 24, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(rgb).save(p)
    g = ds.load_image_gray(p)
    assert g.dtype == np.float32 and g.shape == (16, 24)
    g8 = ds.load_image_gray_u8(p)
    assert g8.dtype == np.uint8

    dep = (np.random.RandomState(6).rand(16, 24) * 30000).astype(np.uint16)
    pd = str(tmp_path / "d.png")
    Image.fromarray(dep).save(pd)
    raw = ds.load_depth_raw(pd)
    assert raw.dtype == np.uint16 and np.array_equal(raw, dep)
    scaled = ds.load_depth(pd, 5000.0)
    assert np.allclose(scaled, dep.astype(np.float32) / 5000.0)

    items = [
        ds.SequenceItem(0.1, p, depth=pd),
        ds.SequenceItem(0.2, p, depth=pd),
    ]
    pf = ds.FramePrefetcher(items, lookahead=2, threads=1)
    f0 = pf[0]
    assert f0["image"].dtype == np.uint8 and f0["depth"].dtype == np.uint16
    # frames are single-consumption; iterate a fresh prefetcher
    frames = list(ds.FramePrefetcher(items, lookahead=2, threads=1))
    assert len(frames) == 2 and frames[1]["timestamp"] == 0.2
