"""Round-trip tests for COLMAP dense-workspace I/O
(utils/colmap/dense_io.py; reference read_write_dense.py /
read_write_fused_vis.py)."""

import numpy as np
import pytest

from nerf_replication_tpu.utils.colmap.dense_io import (
    MeshPoint,
    read_array,
    read_fused,
    write_array,
    write_fused,
)


def test_depth_map_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 10.0, size=(13, 21)).astype(np.float32)
    p = str(tmp_path / "depth.bin")
    write_array(depth, p)
    back = read_array(p)
    assert back.shape == (13, 21)
    np.testing.assert_array_equal(back, depth)


def test_normal_map_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    normals = rng.normal(size=(7, 9, 3)).astype(np.float32)
    p = str(tmp_path / "normal.bin")
    write_array(normals, p)
    back = read_array(p)
    assert back.shape == (7, 9, 3)
    np.testing.assert_array_equal(back, normals)


def test_mat_header_layout(tmp_path):
    """The on-disk layout is '{w}&{h}&{c}&' + column-major f32 — checked
    byte-for-byte so we stay compatible with COLMAP's mat.h."""
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)  # H=2, W=3
    p = str(tmp_path / "m.bin")
    write_array(arr, p)
    raw = open(p, "rb").read()
    assert raw.startswith(b"3&2&1&")
    vals = np.frombuffer(raw[len(b"3&2&1&"):], "<f4")
    # Mat<T> stores column-major over (W, H, C), i.e. width index
    # fastest: pixel (h, w) lands at flat position h*W + w
    np.testing.assert_array_equal(vals, [0, 1, 2, 3, 4, 5])


def test_write_array_rejects_non_f32(tmp_path):
    with pytest.raises(ValueError, match="float32"):
        write_array(np.zeros((2, 2), np.float64), str(tmp_path / "x.bin"))


def test_fused_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    points = []
    for i in range(5):
        k = int(rng.integers(0, 4))
        points.append(MeshPoint(
            position=rng.normal(size=3).astype(np.float32),
            color=rng.integers(0, 256, 3).astype(np.uint8),
            normal=rng.normal(size=3).astype(np.float32),
            num_visible_images=k,
            visible_image_idxs=rng.integers(0, 100, k).astype(np.int64),
        ))
    ply = str(tmp_path / "fused.ply")
    vis = str(tmp_path / "fused.ply.vis")
    write_fused(points, ply, vis)
    back = read_fused(ply, vis)
    assert len(back) == 5
    for a, b in zip(points, back):
        np.testing.assert_allclose(b.position, a.position, rtol=1e-6)
        np.testing.assert_array_equal(b.color, a.color)
        np.testing.assert_allclose(b.normal, a.normal, rtol=1e-6)
        assert b.num_visible_images == a.num_visible_images
        np.testing.assert_array_equal(b.visible_image_idxs,
                                      a.visible_image_idxs)


def test_fused_vis_count_mismatch(tmp_path):
    points = [MeshPoint(np.zeros(3, np.float32), np.zeros(3, np.uint8),
                        np.zeros(3, np.float32), 0,
                        np.zeros(0, np.int64))]
    ply = str(tmp_path / "f.ply")
    vis = str(tmp_path / "f.ply.vis")
    write_fused(points, ply, vis)
    import struct
    with open(vis, "r+b") as f:
        f.write(struct.pack("<Q", 7))
    with pytest.raises(ValueError, match="visibility records"):
        read_fused(ply, vis)
