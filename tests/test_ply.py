"""PLY I/O round-trips (reference plyfile.py capability subset)."""

import numpy as np
import pytest

from nerf_replication_tpu.utils.ply import read_ply, write_ply


def _mesh():
    rng = np.random.default_rng(0)
    verts = {
        "x": rng.normal(size=10).astype(np.float32),
        "y": rng.normal(size=10).astype(np.float32),
        "z": rng.normal(size=10).astype(np.float32),
        "red": rng.integers(0, 255, 10).astype(np.uint8),
    }
    faces = {"vertex_indices": rng.integers(0, 10, (6, 3)).astype(np.int32)}
    return {"vertex": verts, "face": faces}


@pytest.mark.parametrize("fmt", ["binary", "ascii"])
def test_ply_roundtrip(tmp_path, fmt):
    mesh = _mesh()
    path = str(tmp_path / f"m_{fmt}.ply")
    write_ply(path, mesh, fmt=fmt)
    back = read_ply(path)
    for p in ("x", "y", "z"):
        np.testing.assert_allclose(back["vertex"][p], mesh["vertex"][p],
                                   rtol=1e-6)
    np.testing.assert_array_equal(back["vertex"]["red"],
                                  mesh["vertex"]["red"])
    np.testing.assert_array_equal(
        np.asarray(back["face"]["vertex_indices"], np.int32),
        mesh["face"]["vertex_indices"])


def test_reads_mesh_utils_output(tmp_path):
    """The mesh extractor's binary PLY is parseable by read_ply."""
    from nerf_replication_tpu.utils.mesh_utils import write_ply as mesh_write

    verts = np.random.default_rng(1).normal(size=(12, 3)).astype(np.float32)
    faces = np.random.default_rng(2).integers(0, 12, (4, 3)).astype(np.int32)
    path = str(tmp_path / "mesh.ply")
    mesh_write(path, verts, faces)
    back = read_ply(path)
    np.testing.assert_allclose(
        np.stack([back["vertex"][c] for c in "xyz"], -1), verts, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(back["face"]["vertex_indices"], np.int32), faces)
