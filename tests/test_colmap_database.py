"""COLMAP SQLite database round-trips (reference database.py parity)."""

import numpy as np

from nerf_replication_tpu.utils.colmap.database import (
    COLMAPDatabase,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (7, 3), (100000, 99999)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = sorted((a, b))
        assert pair_id_to_image_ids(pid) == (lo, hi)
        assert image_ids_to_pair_id(b, a) == pid  # symmetric


def test_database_roundtrip(tmp_path):
    db = COLMAPDatabase.connect(str(tmp_path / "colmap.db"))
    db.create_tables()

    cam = db.add_camera("PINHOLE", 640, 480,
                        [500.0, 510.0, 320.0, 240.0],
                        prior_focal_length=True)
    im1 = db.add_image("r_0.png", cam)
    im2 = db.add_image("r_1.png", cam)

    rng = np.random.default_rng(0)
    kp1 = rng.uniform(0, 640, (50, 2)).astype(np.float32)
    kp2 = rng.uniform(0, 640, (40, 2)).astype(np.float32)
    db.add_keypoints(im1, kp1)
    db.add_keypoints(im2, kp2)
    db.add_descriptors(im1, rng.integers(0, 255, (50, 128), dtype=np.uint8))
    matches = np.stack([np.arange(30), np.arange(30) + 5],
                       -1).astype(np.uint32)
    # insert with REVERSED ids: storage must canonicalize column order
    db.add_matches(im2, im1, matches[:, ::-1])
    db.add_two_view_geometry(im1, im2, matches)
    db.commit()

    cams = db.read_cameras()
    assert cams[cam]["width"] == 640 and cams[cam]["prior_focal_length"]
    np.testing.assert_allclose(cams[cam]["params"],
                               [500.0, 510.0, 320.0, 240.0])
    imgs = db.read_images()
    assert imgs[im1]["name"] == "r_0.png"
    np.testing.assert_allclose(db.read_keypoints(im1), kp1)
    np.testing.assert_array_equal(db.read_matches(im1, im2), matches)
    np.testing.assert_array_equal(db.read_matches(im2, im1),
                                  matches[:, ::-1])
    db.close()

    # a fresh connection (as the colmap binary would open) sees the data
    db2 = COLMAPDatabase.connect(str(tmp_path / "colmap.db"))
    assert len(db2.read_images()) == 2
    db2.close()
