"""COLMAP dense-workspace I/O: depth/normal maps and fused point clouds.

Capability parity with the reference's vendored toolbox
(`/root/reference/src/utils/colmap/read_write_dense.py:40-90`,
`read_write_fused_vis.py:47-125`), re-implemented against the on-disk
formats (COLMAP `src/mvs/mat.h` Mat<T>::Read/Write and
`src/mvs/fusion.cc` WritePointsVisibility):

* depth / normal maps (``*.bin``): an ASCII header ``{w}&{h}&{c}&``
  followed by little-endian float32 samples in column-major order;
* fused clouds: a binary PLY (x y z nx ny nz red green blue) — via our
  own reader/writer (utils/ply.py), not pyntcloud — plus the ``.vis``
  sidecar: uint64 point count, then per point a uint32 visible-image
  count and that many uint32 image indices.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

from ..ply import read_ply, write_ply


def read_array(path: str) -> np.ndarray:
    """Read a COLMAP Mat<float> (depth or normal map).

    Returns (H, W) for single-channel maps, (H, W, C) otherwise.
    """
    with open(path, "rb") as f:
        fields = []
        cur = b""
        while len(fields) < 3:
            ch = f.read(1)
            if not ch:
                raise ValueError(f"{path}: truncated Mat header")
            if ch == b"&":
                fields.append(int(cur))
                cur = b""
            else:
                cur += ch
        w, h, c = fields
        data = np.fromfile(f, np.float32, count=w * h * c)
    if data.size != w * h * c:
        raise ValueError(f"{path}: expected {w * h * c} samples, "
                         f"got {data.size}")
    # file stores column-major (width-fastest): (W, H, C) -> (H, W, C)
    arr = data.reshape(w, h, c, order="F").transpose(1, 0, 2)
    return arr[..., 0] if c == 1 else arr


def write_array(array: np.ndarray, path: str):
    """Write a float32 (H, W) or (H, W, C) array as a COLMAP Mat."""
    array = np.asarray(array)
    if array.dtype != np.float32:
        raise ValueError("COLMAP Mat files store float32")
    if array.ndim == 2:
        array = array[..., None]
    if array.ndim != 3:
        raise ValueError(f"expected 2-D or 3-D array, got {array.shape}")
    h, w, c = array.shape
    with open(path, "wb") as f:
        f.write(f"{w}&{h}&{c}&".encode("ascii"))
        f.write(array.transpose(1, 0, 2).astype("<f4").tobytes(order="F"))


class MeshPoint(NamedTuple):
    position: np.ndarray          # (3,) float
    color: np.ndarray             # (3,) uint8
    normal: np.ndarray            # (3,) float
    num_visible_images: int
    visible_image_idxs: np.ndarray  # (num_visible_images,) int


def read_fused(ply_path: str, vis_path: str) -> list[MeshPoint]:
    """Read fused.ply + fused.ply.vis into MeshPoint records."""
    cloud = read_ply(ply_path)["vertex"]
    xyz = np.stack([cloud["x"], cloud["y"], cloud["z"]], axis=1)
    nrm = np.stack([cloud["nx"], cloud["ny"], cloud["nz"]], axis=1)
    rgb = np.stack([cloud["red"], cloud["green"], cloud["blue"]], axis=1)

    points = []
    with open(vis_path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        if n != xyz.shape[0]:
            raise ValueError(
                f"{vis_path}: {n} visibility records but {xyz.shape[0]} "
                "PLY points")
        for i in range(n):
            (k,) = struct.unpack("<I", f.read(4))
            idxs = np.frombuffer(f.read(4 * k), "<u4").astype(np.int64)
            points.append(MeshPoint(xyz[i], rgb[i], nrm[i], k, idxs))
    return points


def write_fused(points: list[MeshPoint], ply_path: str, vis_path: str):
    """Write MeshPoint records as fused.ply + fused.ply.vis."""
    xyz = np.asarray([p.position for p in points], np.float32)
    nrm = np.asarray([p.normal for p in points], np.float32)
    rgb = np.asarray([p.color for p in points], np.uint8)
    write_ply(ply_path, {"vertex": {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": nrm[:, 0], "ny": nrm[:, 1], "nz": nrm[:, 2],
        "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
    }})
    with open(vis_path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for p in points:
            f.write(struct.pack("<I", int(p.num_visible_images)))
            f.write(np.asarray(p.visible_image_idxs,
                               "<u4").tobytes())
