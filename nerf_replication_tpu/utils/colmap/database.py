"""COLMAP SQLite database I/O.

Capability parity with the reference's vendored
`src/utils/colmap/database.py` (ETH/UNC COLMAP tooling): create the
schema COLMAP expects (cameras, images, keypoints, descriptors,
matches, two_view_geometries), add rows with numpy<->blob packing, and
the pair-id arithmetic COLMAP uses to key match tables. Fresh, compact
implementation of the documented schema
(colmap.github.io/database.html) — supports pre-seeding a database with
known intrinsics/poses before running COLMAP's matcher/mapper, and
inspecting the reconstruction artifacts afterwards.
"""

from __future__ import annotations

import sqlite3

import numpy as np

MAX_IMAGE_ID = 2 ** 31 - 1

_SCHEMA = """
CREATE TABLE IF NOT EXISTS cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL,
    width INTEGER NOT NULL,
    height INTEGER NOT NULL,
    params BLOB,
    prior_focal_length INTEGER NOT NULL);
CREATE TABLE IF NOT EXISTS images (
    image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE,
    camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < {maxid}),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id));
CREATE TABLE IF NOT EXISTS keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE IF NOT EXISTS two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL,
    F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
CREATE UNIQUE INDEX IF NOT EXISTS index_name ON images(name);
""".format(maxid=MAX_IMAGE_ID)

# COLMAP camera-model name -> integer id (colmap/src/base/camera_models.h)
CAMERA_MODELS = {
    "SIMPLE_PINHOLE": 0, "PINHOLE": 1, "SIMPLE_RADIAL": 2, "RADIAL": 3,
    "OPENCV": 4, "OPENCV_FISHEYE": 5, "FULL_OPENCV": 6, "FOV": 7,
    "SIMPLE_RADIAL_FISHEYE": 8, "RADIAL_FISHEYE": 9, "THIN_PRISM_FISHEYE": 10,
}


def image_ids_to_pair_id(image_id1: int, image_id2: int) -> int:
    """COLMAP keys pair tables by min-major packed ids."""
    if image_id1 > image_id2:
        image_id1, image_id2 = image_id2, image_id1
    return image_id1 * MAX_IMAGE_ID + image_id2


def pair_id_to_image_ids(pair_id: int) -> tuple[int, int]:
    image_id2 = pair_id % MAX_IMAGE_ID
    image_id1 = (pair_id - image_id2) // MAX_IMAGE_ID
    return image_id1, image_id2


def _blob(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a).tobytes()


def _unblob(b, dtype, shape):
    if b is None:
        return np.zeros(shape, dtype)
    return np.frombuffer(b, dtype=dtype).reshape(shape)


class COLMAPDatabase(sqlite3.Connection):
    @staticmethod
    def connect(path: str) -> "COLMAPDatabase":
        return sqlite3.connect(path, factory=COLMAPDatabase)

    def create_tables(self):
        self.executescript(_SCHEMA)

    # -- writers ---------------------------------------------------------------
    def add_camera(self, model, width, height, params,
                   prior_focal_length=False, camera_id=None) -> int:
        if isinstance(model, str):
            model = CAMERA_MODELS[model]
        cur = self.execute(
            "INSERT INTO cameras VALUES (?, ?, ?, ?, ?, ?)",
            (camera_id, model, width, height,
             _blob(np.asarray(params, np.float64)),
             int(prior_focal_length)))
        return cur.lastrowid

    def add_image(self, name, camera_id, prior_q=(None,) * 4,
                  prior_t=(None,) * 3, image_id=None) -> int:
        cur = self.execute(
            "INSERT INTO images VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_id, name, camera_id, *prior_q, *prior_t))
        return cur.lastrowid

    def add_keypoints(self, image_id, keypoints):
        keypoints = np.asarray(keypoints, np.float32)
        assert keypoints.ndim == 2 and keypoints.shape[1] in (2, 4, 6)
        self.execute("INSERT INTO keypoints VALUES (?, ?, ?, ?)",
                     (image_id, *keypoints.shape, _blob(keypoints)))

    def add_descriptors(self, image_id, descriptors):
        descriptors = np.ascontiguousarray(descriptors, np.uint8)
        self.execute("INSERT INTO descriptors VALUES (?, ?, ?, ?)",
                     (image_id, *descriptors.shape, _blob(descriptors)))

    def add_matches(self, image_id1, image_id2, matches):
        matches = np.asarray(matches, np.uint32)
        assert matches.ndim == 2 and matches.shape[1] == 2
        if image_id1 > image_id2:
            matches = matches[:, ::-1]
        self.execute("INSERT INTO matches VALUES (?, ?, ?, ?)",
                     (image_ids_to_pair_id(image_id1, image_id2),
                      *matches.shape, _blob(matches)))

    def add_two_view_geometry(self, image_id1, image_id2, matches,
                              F=np.eye(3), E=np.eye(3), H=np.eye(3),
                              qvec=np.array([1.0, 0, 0, 0]),
                              tvec=np.zeros(3), config=2):
        matches = np.asarray(matches, np.uint32)
        if image_id1 > image_id2:
            matches = matches[:, ::-1]
        self.execute(
            "INSERT INTO two_view_geometries VALUES "
            "(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_ids_to_pair_id(image_id1, image_id2), *matches.shape,
             _blob(matches), config,
             _blob(np.asarray(F, np.float64)),
             _blob(np.asarray(E, np.float64)),
             _blob(np.asarray(H, np.float64)),
             _blob(np.asarray(qvec, np.float64)),
             _blob(np.asarray(tvec, np.float64))))

    # -- readers ---------------------------------------------------------------
    def read_cameras(self) -> dict:
        out = {}
        for cid, model, w, h, params, prior in self.execute(
                "SELECT * FROM cameras"):
            out[cid] = {"model": model, "width": w, "height": h,
                        "params": _unblob(params, np.float64, (-1,)),
                        "prior_focal_length": bool(prior)}
        return out

    def read_images(self) -> dict:
        out = {}
        for row in self.execute("SELECT * FROM images"):
            out[row[0]] = {"name": row[1], "camera_id": row[2],
                           "prior_q": row[3:7], "prior_t": row[7:10]}
        return out

    def read_keypoints(self, image_id) -> np.ndarray:
        row = self.execute(
            "SELECT rows, cols, data FROM keypoints WHERE image_id = ?",
            (image_id,)).fetchone()
        return _unblob(row[2], np.float32, (row[0], row[1]))

    def read_matches(self, image_id1, image_id2) -> np.ndarray:
        pid = image_ids_to_pair_id(image_id1, image_id2)
        row = self.execute(
            "SELECT rows, cols, data FROM matches WHERE pair_id = ?",
            (pid,)).fetchone()
        m = _unblob(row[2], np.uint32, (row[0], row[1]))
        return m[:, ::-1] if image_id1 > image_id2 else m
