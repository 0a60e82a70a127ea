import os

import numpy as np

from nerf_replication_tpu.utils.mesh_utils import (
    density_grid,
    marching_tetrahedra,
    write_ply,
)


def _sphere_grid(R=48, radius=0.7, bounds=(-1.0, 1.0)):
    axis = np.linspace(bounds[0], bounds[1], R, dtype=np.float32)
    X, Y, Z = np.meshgrid(axis, axis, axis, indexing="ij")
    return radius - np.sqrt(X**2 + Y**2 + Z**2)  # >0 inside


def test_marching_tetrahedra_sphere_geometry():
    grid = _sphere_grid()
    verts, faces = marching_tetrahedra(grid, 0.0, bounds=(-1.0, 1.0))
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.7, atol=0.03)
    assert radii.std() < 0.03
    # surface area close to 4*pi*r^2
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.49, rtol=0.08)


def test_empty_level_set():
    grid = _sphere_grid()
    verts, faces = marching_tetrahedra(grid, 10.0)
    assert len(verts) == 0 and len(faces) == 0


def test_write_ply(tmp_path):
    grid = _sphere_grid(R=24)
    verts, faces = marching_tetrahedra(grid, 0.0, bounds=(-1.0, 1.0))
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces)
    with open(path, "rb") as f:
        head = f.read(200).decode("ascii", errors="ignore")
    assert head.startswith("ply")
    assert f"element vertex {len(verts)}" in head
    assert os.path.getsize(path) > 12 * len(verts)


def test_density_grid_query():
    def query(pts):
        return (0.5 - np.linalg.norm(pts, axis=-1)).astype(np.float32)

    g = density_grid(query, resolution=16, bounds=(-1.0, 1.0))
    assert g.shape == (16, 16, 16)
    assert g[8, 8, 8] > 0  # center inside
    assert g[0, 0, 0] < 0


def test_img_utils():
    from nerf_replication_tpu.utils.img_utils import (
        horizon_concate,
        visualize_depth_numpy,
    )

    a = np.zeros((4, 6, 3), np.float32)
    b = np.ones((3, 2, 3), np.float32)
    out = horizon_concate(a, b)
    assert out.shape == (4, 8, 3)
    d = np.linspace(2, 6, 64).reshape(8, 8)
    vis = visualize_depth_numpy(d)
    assert vis.shape == (8, 8, 3) and vis.dtype == np.uint8


def test_native_matches_numpy():
    """C++ core and numpy fallback must agree geometrically."""
    import pytest

    from nerf_replication_tpu.utils.mesh_utils import (
        _marching_tetrahedra_numpy,
        marching_tetrahedra_native,
    )

    grid = _sphere_grid(R=32)
    native = marching_tetrahedra_native(grid, 0.0, bounds=(-1.0, 1.0))
    if native is None:
        pytest.skip("native lib unavailable")
    nv, nf = native
    pv, pf = _marching_tetrahedra_numpy(grid, 0.0, bounds=(-1.0, 1.0))
    assert len(nf) == len(pf)  # same triangle count
    # same surface: mean radius and area agree
    for verts, faces in ((nv, nf), (pv, pf)):
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.7, atol=0.03)
    a = nv[nf[:, 0]]; b = nv[nf[:, 1]]; c = nv[nf[:, 2]]
    area_n = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    a = pv[pf[:, 0]]; b = pv[pf[:, 1]]; c = pv[pf[:, 2]]
    area_p = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    np.testing.assert_allclose(area_n, area_p, rtol=1e-3)
    # native dedupes across cells: strictly fewer verts than 3*faces
    assert len(nv) < 3 * len(nf)


def test_native_speed_advantage():
    import time

    import pytest

    from nerf_replication_tpu.utils.mesh_utils import (
        _marching_tetrahedra_numpy,
        marching_tetrahedra_native,
    )

    grid = _sphere_grid(R=64)
    if marching_tetrahedra_native(grid, 0.0) is None:
        pytest.skip("native lib unavailable")
    t0 = time.time()
    marching_tetrahedra_native(grid, 0.0)
    t_native = time.time() - t0
    t0 = time.time()
    _marching_tetrahedra_numpy(grid, 0.0)
    t_numpy = time.time() - t0
    assert t_native < t_numpy
