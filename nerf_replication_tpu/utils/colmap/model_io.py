"""COLMAP sparse-model I/O (cameras / images / points3D, text + binary).

Capability parity with the reference's vendored COLMAP toolbox
(src/utils/colmap/read_write_model.py, 503 LoC) — fresh implementation
of the documented COLMAP file formats
(https://colmap.github.io/format.html), supporting the colmap2nerf
ingestion workflow.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

# camera model id -> (name, n_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class Image:
    id: int
    qvec: np.ndarray     # (4,) w,x,y,z
    tvec: np.ndarray     # (3,)
    camera_id: int
    name: str
    xys: np.ndarray      # (N, 2)
    point3D_ids: np.ndarray  # (N,)


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    t = np.trace(R)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        return np.array([0.25 / s, (R[2, 1] - R[1, 2]) * s,
                         (R[0, 2] - R[2, 0]) * s, (R[1, 0] - R[0, 1]) * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = 2.0 * np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k])
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[i + 1] = 0.25 * s
    q[j + 1] = (R[j, i] + R[i, j]) / s
    q[k + 1] = (R[k, i] + R[i, k]) / s
    return q


# -- text format ---------------------------------------------------------------
def read_cameras_text(path: str) -> dict[int, Camera]:
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cams[int(parts[0])] = Camera(
                id=int(parts[0]), model=parts[1], width=int(parts[2]),
                height=int(parts[3]),
                params=np.array([float(p) for p in parts[4:]]))
    return cams


def read_images_text(path: str) -> dict[int, Image]:
    imgs = {}
    # pair lines POSITIONALLY: COLMAP writes an EMPTY POINTS2D line for
    # images with zero observations, so only comments may be filtered —
    # dropping blank lines would desynchronise the header/points pairing
    # (reference read_write_model.py semantics)
    with open(path) as f:
        lines = [ln.strip() for ln in f if not ln.lstrip().startswith("#")]
    while lines and not lines[-1]:
        lines.pop()  # trailing newline at EOF is not a POINTS2D line
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array([float(v) for v in pts], dtype=np.float64)
        xys = xys.reshape(-1, 3) if len(xys) else np.zeros((0, 3))
        imgs[int(parts[0])] = Image(
            id=int(parts[0]),
            qvec=np.array([float(v) for v in parts[1:5]]),
            tvec=np.array([float(v) for v in parts[5:8]]),
            camera_id=int(parts[8]), name=parts[9],
            xys=xys[:, :2], point3D_ids=xys[:, 2].astype(np.int64))
    return imgs


def write_cameras_text(cams: dict[int, Camera], path: str):
    with open(path, "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        for cam in cams.values():
            params = " ".join(f"{p:.12g}" for p in cam.params)
            f.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")


def write_images_text(imgs: dict[int, Image], path: str):
    with open(path, "w") as f:
        f.write("# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for im in imgs.values():
            q = " ".join(f"{v:.12g}" for v in im.qvec)
            t = " ".join(f"{v:.12g}" for v in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
            pts = " ".join(
                f"{x:.12g} {y:.12g} {int(p)}"
                for (x, y), p in zip(im.xys, im.point3D_ids))
            f.write(pts + "\n")


# -- binary format -------------------------------------------------------------
def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_binary(path: str) -> dict[int, Camera]:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cid, model_id, w, h = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            cams[cid] = Camera(cid, name, int(w), int(h), params)
    return cams


def read_images_binary(path: str) -> dict[int, Image]:
    imgs = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            iid = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "<Q")
            xys = np.empty((n_pts, 2))
            pids = np.empty(n_pts, dtype=np.int64)
            for k in range(n_pts):
                x, y, pid = _read(f, "<ddq")
                xys[k] = (x, y)
                pids[k] = pid
            imgs[iid] = Image(iid, qvec, tvec, cam_id, name.decode(),
                              xys, pids)
    return imgs


def read_points3D_binary(path: str) -> dict[int, Point3D]:
    pts = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            pid = _read(f, "<Q")[0]
            xyz = np.array(_read(f, "<3d"))
            rgb = np.array(_read(f, "<3B"))
            (err,) = _read(f, "<d")
            (track_len,) = _read(f, "<Q")
            track = np.array(_read(f, f"<{2 * track_len}i")).reshape(-1, 2)
            pts[pid] = Point3D(pid, xyz, rgb, err, track[:, 0], track[:, 1])
    return pts


def write_cameras_binary(cams: dict[int, Camera], path: str):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam in cams.values():
            mid = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack(f"<{len(cam.params)}d", *cam.params))


def write_images_binary(imgs: dict[int, Image], path: str):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for im in imgs.values():
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(im.xys)))
            for (x, y), p in zip(im.xys, im.point3D_ids):
                f.write(struct.pack("<ddq", x, y, int(p)))


def read_model(path: str):
    """Auto-detect text/binary; returns (cameras, images)."""
    if os.path.exists(os.path.join(path, "cameras.bin")):
        return (read_cameras_binary(os.path.join(path, "cameras.bin")),
                read_images_binary(os.path.join(path, "images.bin")))
    return (read_cameras_text(os.path.join(path, "cameras.txt")),
            read_images_text(os.path.join(path, "images.txt")))
