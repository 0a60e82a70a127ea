"""Density-field mesh extraction.

Capability parity with reference src/utils/mesh_utils.py:8-46 (256^3
density grid query -> marching-cubes isosurface -> PLY export, driven by
``cfg.level``/``cfg.resolution``). Neither skimage (marching_cubes) nor
trimesh is available in this environment, so iso-surfacing is
implemented from scratch via **marching tetrahedra** (6 tets/cube — no
ambiguous cases, no 256-entry tables) and the PLY writer is a plain
binary-little-endian encoder.

The grid query runs as jitted chunks on device; the surfacing runs on
host numpy (it is output-bound, not FLOP-bound).
"""

from __future__ import annotations

import os
import struct

import numpy as np

# tetrahedra decomposition of a cube (corner indices; corners are
# z-fastest binary order: c = 4x + 2y + z)
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 2],
    [0, 5, 2, 4],
    [5, 2, 4, 6],
    [5, 3, 2, 7],
    [5, 2, 6, 7],
])


def density_grid(query_fn, resolution: int = 256, bounds=(-1.2, 1.2),
                 chunk: int = 262144) -> np.ndarray:
    """Evaluate ``query_fn(pts (N,3)) -> sigma (N,)`` on a grid.
    Returns (R, R, R) float32."""
    lo, hi = bounds
    axis = np.linspace(lo, hi, resolution, dtype=np.float32)
    out = np.empty((resolution, resolution, resolution), dtype=np.float32)
    xs, ys = np.meshgrid(axis, axis, indexing="ij")
    plane = np.stack([xs.ravel(), ys.ravel()], -1)  # (R*R, 2)
    for k in range(resolution):
        pts = np.concatenate(
            [plane, np.full((plane.shape[0], 1), axis[k], np.float32)], -1)
        vals = []
        for i in range(0, pts.shape[0], chunk):
            vals.append(np.asarray(query_fn(pts[i:i + chunk])))
        out[:, :, k] = np.concatenate(vals).reshape(resolution, resolution)
    return out


_NATIVE = None


def _load_native():
    """ctypes binding to the C++ core (native/marching_tets.cpp); builds
    it on first use if the toolchain is present."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    import ctypes
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(root, "native", "libmarching_tets.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _NATIVE = False
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        _NATIVE = False
        return None
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int)
    lib.mt_extract.argtypes = [
        c_fp, ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(c_fp), c_ip, ctypes.POINTER(c_ip), c_ip]
    lib.mt_extract.restype = ctypes.c_int
    lib.mt_free.argtypes = [c_fp, c_ip]
    _NATIVE = lib
    return lib


def marching_tetrahedra_native(grid: np.ndarray, level: float,
                               bounds=(-1.2, 1.2)):
    """C++ iso-surfacer; returns None when the native lib is unavailable."""
    import ctypes

    lib = _load_native()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    R = grid.shape[0]
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int)
    verts_p = c_fp()
    faces_p = c_ip()
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    rc = lib.mt_extract(
        grid.ctypes.data_as(c_fp), R, ctypes.c_float(level),
        ctypes.c_float(bounds[0]), ctypes.c_float(bounds[1]),
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(faces_p), ctypes.byref(nf))
    if rc != 0:
        return None
    if nv.value == 0:
        lib.mt_free(verts_p, faces_p)
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy()
    faces = np.ctypeslib.as_array(faces_p, (nf.value, 3)).copy()
    lib.mt_free(verts_p, faces_p)
    return verts.astype(np.float32), faces.astype(np.int32)


def marching_tetrahedra(grid: np.ndarray, level: float, bounds=(-1.2, 1.2),
                        use_native: bool = True):
    """Iso-surface of a scalar grid. Returns (verts (V,3), faces (F,3)).
    Prefers the C++ core (edge-deduplicated, ~20x faster for 256^3);
    falls back to the vectorized numpy implementation."""
    if use_native:
        out = marching_tetrahedra_native(grid, level, bounds)
        if out is not None:
            return out
    return _marching_tetrahedra_numpy(grid, level, bounds)


def _marching_tetrahedra_numpy(grid: np.ndarray, level: float,
                               bounds=(-1.2, 1.2)):
    """Vectorized numpy fallback."""
    R = grid.shape[0]
    lo, hi = bounds
    scale = (hi - lo) / (R - 1)

    # cube corner values/coords for all cells, corners z-fastest
    corner_vals = np.empty((R - 1, R - 1, R - 1, 8), dtype=np.float32)
    for c in range(8):
        dx, dy, dz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        corner_vals[..., c] = grid[dx:R - 1 + dx, dy:R - 1 + dy, dz:R - 1 + dz]

    ix, iy, iz = np.meshgrid(np.arange(R - 1), np.arange(R - 1),
                             np.arange(R - 1), indexing="ij")
    cell_origin = np.stack([ix, iy, iz], -1).reshape(-1, 3).astype(np.float32)
    corner_vals = corner_vals.reshape(-1, 8)

    # only keep cells crossing the level
    cross = (corner_vals.min(-1) < level) & (corner_vals.max(-1) > level)
    corner_vals = corner_vals[cross]
    cell_origin = cell_origin[cross]
    if corner_vals.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    corner_off = np.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)],
        dtype=np.float32)  # (8,3)

    tris = []
    for tet in _TETS:
        v = corner_vals[:, tet]                        # (N, 4)
        p = cell_origin[:, None, :] + corner_off[tet]  # (N, 4, 3)
        inside = v > level                             # (N, 4)
        count = inside.sum(-1)

        def interp(pa, pb, va, vb):
            t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
            return pa + t[..., None] * (pb - pa)

        # case: exactly one corner inside -> 1 triangle
        for ci in range(4):
            mask = (count == 1) & inside[:, ci]
            if mask.any():
                others = [o for o in range(4) if o != ci]
                pa = p[mask, ci]
                va = v[mask, ci]
                pts = [interp(pa, p[mask, o], va, v[mask, o]) for o in others]
                tris.append(np.stack(pts, axis=1))
            # case: exactly one corner OUTSIDE -> 1 triangle (flipped)
            mask = (count == 3) & ~inside[:, ci]
            if mask.any():
                others = [o for o in range(4) if o != ci]
                pa = p[mask, ci]
                va = v[mask, ci]
                pts = [interp(p[mask, o], pa, v[mask, o], va) for o in others]
                tris.append(np.stack(pts, axis=1))
        # case: two in / two out -> quad = 2 triangles
        for pair in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            a, b = pair
            cset = [o for o in range(4) if o not in pair]
            cmask = (count == 2) & inside[:, a] & inside[:, b]
            if not cmask.any():
                continue
            c, d = cset
            e_ac = interp(p[cmask, a], p[cmask, c], v[cmask, a], v[cmask, c])
            e_ad = interp(p[cmask, a], p[cmask, d], v[cmask, a], v[cmask, d])
            e_bc = interp(p[cmask, b], p[cmask, c], v[cmask, b], v[cmask, c])
            e_bd = interp(p[cmask, b], p[cmask, d], v[cmask, b], v[cmask, d])
            tris.append(np.stack([e_ac, e_ad, e_bd], axis=1))
            tris.append(np.stack([e_ac, e_bd, e_bc], axis=1))

    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri_pts = np.concatenate(tris, axis=0)            # (T, 3, 3) grid coords
    tri_pts = lo + tri_pts * scale                    # to world

    # dedupe vertices
    flat = tri_pts.reshape(-1, 3)
    keys = np.round(flat / (scale * 1e-4)).astype(np.int64)
    keys = np.ascontiguousarray(keys)
    struct = keys.view(
        [("x", np.int64), ("y", np.int64), ("z", np.int64)]).reshape(-1)
    _, idx, inv = np.unique(struct, return_index=True, return_inverse=True)
    verts = flat[idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
          (faces[:, 0] != faces[:, 2]))
    return verts.astype(np.float32), faces[ok]


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    """Binary little-endian PLY writer (replaces trimesh export)."""
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        for face in faces:
            f.write(struct.pack("<B3i", 3, *face))


def extract_mesh(network, params, out_path: str, level: float = 32.0,
                 resolution: int = 256, bounds=(-1.2, 1.2)):
    """Reference extract_mesh equivalent (mesh_utils.py:8-46): query the
    network's density on a grid, surface at ``level``, write PLY."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def query(pts):
        raw = network.apply(params, pts[:, None, :],
                            jnp.zeros_like(pts)[:, None, :], model="fine")
        return jax.nn.relu(raw[:, 0, 3])

    grid = density_grid(query, resolution=resolution, bounds=bounds)
    verts, faces = marching_tetrahedra(grid, level, bounds=bounds)
    write_ply(out_path, verts, faces)
    return verts, faces
