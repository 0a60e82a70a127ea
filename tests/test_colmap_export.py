"""COLMAP exporter round-trips (utils/colmap/exporters.py): bundler /
NVM / PLY conversions re-parsed and checked against the source model —
the conversion breadth of the reference's vendored toolbox
(export_to_bundler.py, export_to_visualsfm.py, bundler_to_ply.py,
nvm_to_ply.py, visualize_model.py)."""

import numpy as np
import pytest

from nerf_replication_tpu.utils.colmap.exporters import (
    export_bundler,
    export_model_ply,
    export_nvm,
    model_summary,
    points_to_ply,
    read_bundler_points,
    read_nvm_points,
)
from nerf_replication_tpu.utils.colmap.model_io import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
)
from nerf_replication_tpu.utils.ply import read_ply


def _norm(q):
    return q / np.linalg.norm(q)


@pytest.fixture()
def model():
    cams = {1: Camera(1, "SIMPLE_PINHOLE", 64, 48,
                      np.array([70.0, 32.0, 24.0]))}
    images = {}
    for i, q in enumerate([[1.0, 0, 0, 0], [0.9, 0.1, -0.2, 0.05]], 1):
        images[i] = Image(
            i, _norm(np.array(q)), np.array([0.1 * i, -0.2, 2.0 + i]),
            1, f"img{i}.png",
            xys=np.array([[10.0 + i, 20.0], [40.0, 30.0 + i]]),
            point3D_ids=np.array([7, 9]))
    pts = {
        7: Point3D(7, np.array([0.5, -0.3, 1.2]), np.array([250, 10, 30]),
                   0.5, np.array([1, 2]), np.array([0, 0])),
        9: Point3D(9, np.array([-1.0, 0.8, 2.5]), np.array([5, 200, 90]),
                   0.8, np.array([1, 2]), np.array([1, 1])),
    }
    return cams, images, pts


def test_bundler_roundtrip(model, tmp_path):
    cams, images, pts = model
    out = tmp_path / "bundle.out"
    lst = tmp_path / "list.txt"
    export_bundler(cams, images, pts, str(out), str(lst))
    head = out.read_text().splitlines()
    assert head[0].startswith("# Bundle file v0.3")
    assert head[1] == "2 2"
    # focal on the first camera line
    assert float(head[2].split()[0]) == 70.0
    # bundler rotation = diag(1,-1,-1) @ R, still orthonormal
    R = np.array([[float(v) for v in head[3 + r].split()]
                  for r in range(3)])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(
        R, np.diag([1.0, -1.0, -1.0]) @ qvec2rotmat(images[1].qvec),
        atol=1e-6)
    xyz, rgb = read_bundler_points(str(out))
    np.testing.assert_allclose(xyz[0], pts[7].xyz, atol=1e-6)
    assert (rgb[1] == pts[9].rgb).all()
    assert lst.read_text().splitlines() == ["img1.png", "img2.png"]


def test_nvm_roundtrip(model, tmp_path):
    cams, images, pts = model
    out = tmp_path / "model.nvm"
    export_nvm(cams, images, pts, str(out))
    rows = out.read_text().splitlines()
    assert rows[0] == "NVM_V3"
    # camera line: name f q(4) center(3) k 0
    v = rows[3].split()
    assert v[0] == "img1.png" and float(v[1]) == 70.0
    R = qvec2rotmat(images[1].qvec)
    c = -R.T @ images[1].tvec
    np.testing.assert_allclose([float(x) for x in v[6:9]], c, atol=1e-6)
    xyz, rgb = read_nvm_points(str(out))
    np.testing.assert_allclose(xyz[1], pts[9].xyz, atol=1e-6)
    assert (rgb[0] == pts[7].rgb).all()


def test_points_to_ply_roundtrip(tmp_path):
    xyz = np.array([[0.0, 1.0, 2.0], [3.0, -4.0, 5.5]])
    rgb = np.array([[1, 2, 3], [250, 251, 252]], np.uint8)
    p = tmp_path / "pts.ply"
    points_to_ply(xyz, rgb, str(p))
    data = read_ply(str(p))["vertex"]
    np.testing.assert_allclose(data["x"], xyz[:, 0], atol=1e-6)
    assert (data["blue"] == rgb[:, 2]).all()


def test_model_summary_and_ply(model, tmp_path):
    cams, images, pts = model
    s = model_summary(cams, images, pts)
    assert s["num_images"] == 2 and s["num_points3D"] == 2
    assert s["mean_track_length"] == 2.0
    assert abs(s["mean_reproj_error"] - 0.65) < 1e-9
    R = qvec2rotmat(images[2].qvec)
    np.testing.assert_allclose(s["camera_centers"][1],
                               -R.T @ images[2].tvec, atol=1e-9)
    p = tmp_path / "model.ply"
    export_model_ply(cams, images, pts, str(p))
    data = read_ply(str(p))["vertex"]
    # 2 points + 2 cameras x 5 frustum vertices
    assert len(data["x"]) == 2 + 10
