"""Inlier-match exports from a COLMAP SQLite database + PLY merging.

Covers the last breadth pieces of the reference's vendored COLMAP
toolbox: ``export_inlier_matches.py:55-86`` (text dump of two-view
inlier matches), ``export_inlier_pairs.py:53-87`` (match-list file for
re-running exhaustive matching on verified pairs), and
``merge_ply_files.py:40-77`` (concatenate homogeneous point PLYs).
Built on this package's own :class:`COLMAPDatabase` reader and
``utils/ply.py`` I/O rather than raw sqlite/plyfile calls.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..ply import read_ply, write_ply
from .database import COLMAPDatabase, pair_id_to_image_ids


def _image_names(db: COLMAPDatabase) -> dict:
    cur = db.execute("SELECT image_id, name FROM images;")
    return {row[0]: row[1] for row in cur}


def iter_inlier_matches(database_path: str, min_num_matches: int = 15):
    """Yield ``(name1, name2, matches (N,2) uint32)`` for every verified
    two-view geometry with at least ``min_num_matches`` inliers."""
    db = COLMAPDatabase.connect(database_path)
    try:
        names = _image_names(db)
        cur = db.execute(
            "SELECT pair_id, rows, data FROM two_view_geometries "
            "WHERE rows >= ?;", (min_num_matches,))
        for pair_id, rows, data in cur:
            id1, id2 = pair_id_to_image_ids(pair_id)
            m = np.frombuffer(data, np.uint32).reshape(rows, 2) \
                if data is not None else np.zeros((0, 2), np.uint32)
            yield names[id1], names[id2], m
    finally:
        db.close()


def export_inlier_matches(database_path: str, output_path: str,
                          min_num_matches: int = 15) -> int:
    """Text dump: per pair a ``name1 name2 N`` header then N ``i j``
    index rows (reference export_inlier_matches.py format). Returns the
    number of pairs written."""
    n = 0
    with open(output_path, "w") as f:
        for name1, name2, m in iter_inlier_matches(
                database_path, min_num_matches):
            f.write(f"{name1} {name2} {m.shape[0]}\n")
            for i, j in m:
                f.write(f"{i} {j}\n")
            n += 1
    return n


def export_inlier_pairs(database_path: str, match_list_path: str,
                        min_num_matches: int = 15) -> int:
    """Match-list file: one ``name1 name2`` line per verified pair
    (reference export_inlier_pairs.py format)."""
    n = 0
    with open(match_list_path, "w") as f:
        for name1, name2, _ in iter_inlier_matches(
                database_path, min_num_matches):
            f.write(f"{name1} {name2}\n")
            n += 1
    return n


def merge_ply_files(folder_or_paths, merged_path: str) -> int:
    """Concatenate the vertex elements of homogeneous PLY files into
    one (reference merge_ply_files.py). Accepts a folder (globs *.ply)
    or an explicit list of paths; returns the merged vertex count."""
    if isinstance(folder_or_paths, (str, os.PathLike)):
        paths = sorted(glob.glob(os.path.join(
            str(folder_or_paths), "*.ply")))
    else:
        paths = list(folder_or_paths)
    if not paths:
        raise ValueError("merge_ply_files: no input PLY files")
    merged = None
    for p in paths:
        el = read_ply(p)
        if "vertex" not in el:
            raise ValueError(f"{p}: no vertex element")
        v = el["vertex"]
        if merged is None:
            merged = {k: [np.asarray(a)] for k, a in v.items()}
        else:
            if set(v) != set(merged):
                raise ValueError(
                    f"{p}: vertex properties {sorted(v)} differ from "
                    f"the first file's {sorted(merged)}")
            for k, a in v.items():
                merged[k].append(np.asarray(a))
    out = {k: np.concatenate(parts) for k, parts in merged.items()}
    write_ply(merged_path, {"vertex": out})
    return int(next(iter(out.values())).shape[0])


def main():  # pragma: no cover — thin CLI over the library fns
    import argparse

    ap = argparse.ArgumentParser(
        description="COLMAP database match exports / PLY merge")
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("inlier_matches")
    m.add_argument("--database_path", required=True)
    m.add_argument("--output_path", required=True)
    m.add_argument("--min_num_matches", type=int, default=15)
    p = sub.add_parser("inlier_pairs")
    p.add_argument("--database_path", required=True)
    p.add_argument("--match_list_path", required=True)
    p.add_argument("--min_num_matches", type=int, default=15)
    g = sub.add_parser("merge_ply")
    g.add_argument("--folder_path", required=True)
    g.add_argument("--merged_path", required=True)
    a = ap.parse_args()
    if a.cmd == "inlier_matches":
        n = export_inlier_matches(a.database_path, a.output_path,
                                  a.min_num_matches)
    elif a.cmd == "inlier_pairs":
        n = export_inlier_pairs(a.database_path, a.match_list_path,
                                a.min_num_matches)
    else:
        n = merge_ply_files(a.folder_path, a.merged_path)
    print(n)


if __name__ == "__main__":
    main()
