"""Inlier-match exports + PLY merge (utils/colmap/match_io.py) against
a database built with this package's own COLMAPDatabase writer —
round-trips the reference export_inlier_matches / export_inlier_pairs /
merge_ply_files text and binary formats."""

import numpy as np
import pytest

from nerf_replication_tpu.utils.colmap.database import COLMAPDatabase
from nerf_replication_tpu.utils.colmap.match_io import (
    export_inlier_matches,
    export_inlier_pairs,
    iter_inlier_matches,
    merge_ply_files,
)
from nerf_replication_tpu.utils.ply import read_ply, write_ply


@pytest.fixture()
def db_path(tmp_path):
    p = str(tmp_path / "scene.db")
    db = COLMAPDatabase.connect(p)
    db.create_tables()
    cam = db.add_camera(1, 64, 48, np.array([60.0, 32.0, 24.0]))
    i1 = db.add_image("a.png", cam)
    i2 = db.add_image("b.png", cam)
    i3 = db.add_image("c.png", cam)
    m12 = np.stack([np.arange(20, dtype=np.uint32),
                    np.arange(20, dtype=np.uint32) + 5], -1)
    m13 = np.stack([np.arange(4, dtype=np.uint32),
                    np.arange(4, dtype=np.uint32) + 1], -1)
    db.add_two_view_geometry(i1, i2, m12)
    db.add_two_view_geometry(i1, i3, m13)   # below min_num_matches=15
    db.commit()
    db.close()
    return p


def test_iter_and_export_matches(db_path, tmp_path):
    got = list(iter_inlier_matches(db_path, min_num_matches=15))
    assert len(got) == 1
    name1, name2, m = got[0]
    assert {name1, name2} == {"a.png", "b.png"}
    assert m.shape == (20, 2)
    np.testing.assert_array_equal(m[:, 1] - m[:, 0], 5)

    out = str(tmp_path / "matches.txt")
    assert export_inlier_matches(db_path, out, 15) == 1
    lines = open(out).read().splitlines()
    head = lines[0].split()
    assert head[2] == "20" and len(lines) == 21
    assert lines[1].split() == ["0", "5"]

    # min_num_matches=1 includes the small pair
    assert export_inlier_matches(db_path, out, 1) == 2


def test_export_pairs(db_path, tmp_path):
    out = str(tmp_path / "pairs.txt")
    assert export_inlier_pairs(db_path, out, 15) == 1
    assert len(open(out).read().splitlines()) == 1
    assert export_inlier_pairs(db_path, out, 1) == 2


def test_merge_ply(tmp_path):
    rng = np.random.default_rng(0)
    parts = []
    for i in range(3):
        el = {"x": rng.normal(size=5).astype(np.float32),
              "y": rng.normal(size=5).astype(np.float32),
              "z": rng.normal(size=5).astype(np.float32),
              "red": rng.integers(0, 255, 5).astype(np.uint8)}
        p = str(tmp_path / f"part{i}.ply")
        write_ply(p, {"vertex": el})
        parts.append(el)
    merged = str(tmp_path / "merged.ply")
    n = merge_ply_files(str(tmp_path), merged)
    assert n == 15
    v = read_ply(merged)["vertex"]
    np.testing.assert_allclose(
        np.asarray(v["x"]),
        np.concatenate([p["x"] for p in parts]), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(v["red"]),
        np.concatenate([p["red"] for p in parts]))

    # heterogeneous property sets refuse to merge
    bad = {"x": np.zeros(2, np.float32)}
    write_ply(str(tmp_path / "zz_bad.ply"), {"vertex": bad})
    with pytest.raises(ValueError, match="differ"):
        merge_ply_files(str(tmp_path), merged)
