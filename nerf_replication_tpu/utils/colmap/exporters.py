"""COLMAP model exporters: Bundler, VisualSFM (NVM), and point-cloud
conversions.

Covers the conversion breadth of the reference's vendored COLMAP
toolbox (`/root/reference/src/utils/colmap/export_to_bundler.py`,
`export_to_visualsfm.py`, `bundler_to_ply.py`, `nvm_to_ply.py`,
`visualize_model.py`) re-implemented from the public format
specifications over this package's own model I/O (model_io.py). The
reference scripts export straight from a COLMAP SQLite database or
model directory; here the inputs are the in-memory ``(cameras, images,
points3d)`` dicts returned by :func:`..model_io.read_model`, which
composes with both the text and binary readers.

Conventions:

* COLMAP stores world-to-camera rotation ``R = qvec2rotmat(qvec)`` and
  translation ``tvec``; the camera center is ``c = -R.T @ t``.
* Bundler v0.3 cameras look down ``-z`` (OpenGL), COLMAP down ``+z``:
  the export conjugates with ``diag(1, -1, -1)``.
* NVM v3 stores the world-to-camera quaternion and the camera CENTER
  (not the translation), one measurement block per 3D point.
"""

from __future__ import annotations

import os

import numpy as np

from .model_io import qvec2rotmat


def _focal(cam) -> float:
    """First parameter is the focal for every COLMAP camera model
    (SIMPLE_PINHOLE/SIMPLE_RADIAL f cx cy [k]; PINHOLE fx fy cx cy)."""
    return float(cam.params[0])


def _radial_k(cam) -> float:
    if cam.model in ("SIMPLE_RADIAL", "RADIAL"):
        return float(cam.params[3])
    return 0.0


def export_bundler(cameras, images, points3d, out_path: str,
                   list_path: str | None = None) -> None:
    """Write a Bundler v0.3 ``bundle.out`` (+ image list) from a COLMAP
    model. Mirrors the capability of the reference
    ``export_to_bundler.py`` (ETH/UNC toolbox) from a reconstructed
    model instead of a raw feature database."""
    ordered = sorted(images.values(), key=lambda im: im.id)
    idx_of = {im.id: i for i, im in enumerate(ordered)}
    flip = np.diag([1.0, -1.0, -1.0])
    pts = sorted(points3d.values(), key=lambda p: p.id)
    lines = ["# Bundle file v0.3",
             f"{len(ordered)} {len(pts)}"]
    for im in ordered:
        cam = cameras[im.camera_id]
        R = flip @ qvec2rotmat(im.qvec)
        t = flip @ im.tvec
        lines.append(f"{_focal(cam):.9g} {_radial_k(cam):.9g} 0")
        for r in R:
            lines.append(" ".join(f"{v:.9g}" for v in r))
        lines.append(" ".join(f"{v:.9g}" for v in t))
    for p in pts:
        lines.append(" ".join(f"{v:.9g}" for v in p.xyz))
        lines.append(" ".join(str(int(v)) for v in p.rgb))
        view = []
        for img_id, p2d_idx in zip(p.image_ids, p.point2D_idxs):
            im = images[int(img_id)]
            cam = cameras[im.camera_id]
            x, y = im.xys[int(p2d_idx)]
            # bundler measurements are relative to the image center,
            # y up
            cx, cy = cam.width / 2.0, cam.height / 2.0
            view.append(f"{idx_of[im.id]} {int(p2d_idx)} "
                        f"{x - cx:.4g} {cy - y:.4g}")
        lines.append(f"{len(view)} " + " ".join(view))
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    if list_path:
        with open(list_path, "w") as f:
            for im in ordered:
                f.write(im.name + "\n")


def export_nvm(cameras, images, points3d, path: str) -> None:
    """Write a VisualSFM NVM_V3 file from a COLMAP model (reference
    capability: ``export_to_visualsfm.py``)."""
    ordered = sorted(images.values(), key=lambda im: im.id)
    idx_of = {im.id: i for i, im in enumerate(ordered)}
    lines = ["NVM_V3", "", str(len(ordered))]
    for im in ordered:
        cam = cameras[im.camera_id]
        R = qvec2rotmat(im.qvec)
        c = -R.T @ im.tvec
        q = im.qvec
        lines.append(
            f"{im.name} {_focal(cam):.9g} "
            f"{q[0]:.9g} {q[1]:.9g} {q[2]:.9g} {q[3]:.9g} "
            f"{c[0]:.9g} {c[1]:.9g} {c[2]:.9g} {-_radial_k(cam):.9g} 0")
    pts = sorted(points3d.values(), key=lambda p: p.id)
    lines += ["", str(len(pts))]
    for p in pts:
        ms = []
        for img_id, p2d_idx in zip(p.image_ids, p.point2D_idxs):
            im = images[int(img_id)]
            cam = cameras[im.camera_id]
            x, y = im.xys[int(p2d_idx)]
            cx, cy = cam.width / 2.0, cam.height / 2.0
            ms.append(f"{idx_of[im.id]} {int(p2d_idx)} "
                      f"{x - cx:.4g} {y - cy:.4g}")
        xyz = " ".join(f"{v:.9g}" for v in p.xyz)
        rgb = " ".join(str(int(v)) for v in p.rgb)
        lines.append(f"{xyz} {rgb} {len(ms)} " + " ".join(ms))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_bundler_points(path: str):
    """Parse positions/colors back out of a Bundler v0.3 file
    (``bundler_to_ply.py`` capability). Returns (xyz (N,3), rgb (N,3))."""
    with open(path) as f:
        rows = [ln.strip() for ln in f if ln.strip()
                and not ln.startswith("#")]
    n_cam, n_pts = (int(v) for v in rows[0].split())
    at = 1 + 5 * n_cam
    xyz, rgb = [], []
    for _ in range(n_pts):
        xyz.append([float(v) for v in rows[at].split()])
        rgb.append([int(v) for v in rows[at + 1].split()])
        at += 3
    return np.asarray(xyz, np.float64), np.asarray(rgb, np.uint8)


def read_nvm_points(path: str):
    """Parse positions/colors out of an NVM_V3 file (``nvm_to_ply.py``
    capability). Returns (xyz (N,3), rgb (N,3))."""
    with open(path) as f:
        rows = [ln.rstrip("\n") for ln in f]
    assert rows[0].startswith("NVM_V3"), "not an NVM_V3 file"
    at = 1
    while not rows[at].strip():
        at += 1
    n_cam = int(rows[at].strip())
    at += 1 + n_cam
    while not rows[at].strip():
        at += 1
    n_pts = int(rows[at].strip())
    at += 1
    xyz, rgb = [], []
    for i in range(n_pts):
        v = rows[at + i].split()
        xyz.append([float(x) for x in v[:3]])
        rgb.append([int(x) for x in v[3:6]])
    return np.asarray(xyz, np.float64), np.asarray(rgb, np.uint8)


def points_to_ply(xyz: np.ndarray, rgb: np.ndarray, path: str) -> None:
    """Dump a point cloud as binary PLY via the package writer
    (capability of ``bundler_to_ply.py`` / ``nvm_to_ply.py``)."""
    from ..ply import write_ply

    vertex = {
        "x": xyz[:, 0].astype(np.float32),
        "y": xyz[:, 1].astype(np.float32),
        "z": xyz[:, 2].astype(np.float32),
        "red": rgb[:, 0].astype(np.uint8),
        "green": rgb[:, 1].astype(np.uint8),
        "blue": rgb[:, 2].astype(np.uint8),
    }
    write_ply(path, {"vertex": vertex})


def model_summary(cameras, images, points3d) -> dict:
    """Model statistics + camera frusta as geometry, the headless
    equivalent of the reference's open3d ``visualize_model.py``
    (capability: inspect a reconstruction without a GUI)."""
    track_lens = [len(p.image_ids) for p in points3d.values()]
    errors = [float(p.error) for p in points3d.values()]
    centers = []
    for im in sorted(images.values(), key=lambda im: im.id):
        R = qvec2rotmat(im.qvec)
        centers.append(-R.T @ im.tvec)
    return {
        "num_cameras": len(cameras),
        "num_images": len(images),
        "num_points3D": len(points3d),
        "mean_track_length": float(np.mean(track_lens)) if track_lens
        else 0.0,
        "mean_reproj_error": float(np.mean(errors)) if errors else 0.0,
        "camera_centers": np.asarray(centers),
    }


def export_model_ply(cameras, images, points3d, path: str,
                     frustum_size: float = 0.2) -> None:
    """Write points + camera frusta to one PLY (the inspectable artifact
    ``visualize_model.py`` renders interactively)."""
    pts = sorted(points3d.values(), key=lambda p: p.id)
    xyz = [p.xyz for p in pts]
    rgb = [p.rgb for p in pts]
    s = frustum_size
    corners = np.array([[0, 0, 0], [-s, -s, 2 * s], [s, -s, 2 * s],
                        [s, s, 2 * s], [-s, s, 2 * s]])
    for im in sorted(images.values(), key=lambda im: im.id):
        R = qvec2rotmat(im.qvec)
        c = -R.T @ im.tvec
        for p in corners:
            xyz.append(R.T @ p + c)
            rgb.append(np.array([255, 0, 0]))
    points_to_ply(np.asarray(xyz), np.asarray(rgb, np.uint8), path)


def main():  # pragma: no cover — thin CLI over the library fns
    import argparse

    from .model_io import read_model

    ap = argparse.ArgumentParser(
        description="export a COLMAP model to bundler/nvm/ply")
    ap.add_argument("--input_model", required=True)
    ap.add_argument("--format", choices=["bundler", "nvm", "ply"],
                    required=True)
    ap.add_argument("--output_path", required=True)
    a = ap.parse_args()
    cams, imgs, pts = read_model(a.input_model)
    if a.format == "bundler":
        export_bundler(cams, imgs, pts, a.output_path,
                       os.path.splitext(a.output_path)[0] + ".list.txt")
    elif a.format == "nvm":
        export_nvm(cams, imgs, pts, a.output_path)
    else:
        export_model_ply(cams, imgs, pts, a.output_path)
    print("wrote", a.output_path)


if __name__ == "__main__":  # pragma: no cover
    main()
