"""Tests for the legacy-parity utility layer (losses, geometry, masks,
cfg freeze/deprecation, keras loading, vestigial datasets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_replication_tpu.config import CN
from nerf_replication_tpu.utils import losses
from nerf_replication_tpu.utils.data_utils import get_near_far, load_K_Rt_from_P
from nerf_replication_tpu.utils.mask_utils import (
    alpha_to_mask,
    bbox_to_mask,
    dilate,
    erode,
    mask_to_bbox,
)


def test_losses_basic():
    pred = jnp.array([[0.5, 0.5, 0.5]])
    tgt = jnp.array([[1.0, 0.0, 0.5]])
    assert float(losses.mse(pred, tgt)) == pytest.approx(1 / 6, rel=1e-5)
    assert float(losses.smooth_l1(pred, tgt)) > 0
    logits = jnp.array([2.0, -2.0])
    targets = jnp.array([1.0, 0.0])
    assert float(losses.focal_loss(logits, targets)) < \
        float(losses.focal_loss(-logits, targets))


def test_poly_matching_rotation_invariant():
    poly = jnp.array([[[0.0, 0], [1, 0], [1, 1], [0, 1]]])
    rolled = jnp.roll(poly, 2, axis=1)
    assert float(losses.poly_matching_loss(poly, rolled)) < 1e-6


def test_ae_loss_groups():
    emb_good = jnp.array([[0.0], [0.0], [5.0], [5.0]])
    emb_bad = jnp.array([[0.0], [5.0], [0.0], [5.0]])
    gid = jnp.array([0, 0, 1, 1])
    assert float(losses.ae_loss(emb_good, gid)) < \
        float(losses.ae_loss(emb_bad, gid))


def test_load_K_Rt_roundtrip():
    K = np.array([[500.0, 0, 320], [0, 510, 240], [0, 0, 1]])
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    t = np.array([0.1, -0.2, 2.0])
    P = K @ np.concatenate([R, t[:, None]], axis=1)
    intr, pose = load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], -R.T @ t, atol=1e-6)


def test_get_near_far():
    bounds = np.array([[-1.0, -1, -1], [1, 1, 1]])
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far, hit = get_near_far(bounds, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(near[0]), 4.0)


def test_mask_utils():
    m = np.zeros((10, 10), bool)
    m[3:6, 4:8] = True
    assert mask_to_bbox(m) == (4, 3, 8, 6)
    m2 = bbox_to_mask((4, 3, 8, 6), 10, 10)
    np.testing.assert_array_equal(m, m2)
    assert dilate(m).sum() > m.sum()
    assert erode(m).sum() < m.sum()
    assert alpha_to_mask(np.array([0.2, 0.9])).tolist() == [False, True]
    assert mask_to_bbox(np.zeros((4, 4), bool)) is None


def test_cfg_freeze_and_deprecated_keys():
    c = CN({"a": 1, "sub": {"b": 2}})
    c.freeze()
    with pytest.raises(AttributeError):
        c.a = 5
    with pytest.raises(AttributeError):
        c.sub.b = 3
    c.defrost()
    c.a = 5
    assert c.a == 5
    c.register_deprecated_key("old_key")
    c.register_renamed_key("lr", "train_lr")
    c.merge_from_other({"old_key": 1, "lr": 0.1})
    assert "old_key" not in c
    assert c.train_lr == 0.1


def test_load_weights_from_keras_shapes():
    from nerf_replication_tpu.models.nerf.network import (
        load_weights_from_keras)

    rng = np.random.default_rng(0)
    depth, W, in_ch, view_ch = 2, 8, 5, 3
    weights = []
    dims = [(in_ch, W), (W, W)]
    for i, (a, b) in enumerate(dims):
        weights += [rng.normal(size=(a, b)), rng.normal(size=b)]
    weights += [rng.normal(size=(W, W)), rng.normal(size=W)]        # feature
    weights += [rng.normal(size=(W + view_ch, W // 2)),
                rng.normal(size=W // 2)]                             # views_0
    weights += [rng.normal(size=(W // 2, 3)), rng.normal(size=3)]    # rgb
    weights += [rng.normal(size=(W, 1)), rng.normal(size=1)]         # alpha
    p = load_weights_from_keras(weights, depth=depth)
    assert p["pts_0"]["kernel"].shape == (in_ch, W)
    assert p["views_0"]["kernel"].shape == (W + view_ch, W // 2)
    assert p["alpha"]["kernel"].shape == (W, 1)


def test_latent_dataset(tmp_path):
    from nerf_replication_tpu.datasets.latent import Dataset

    data = np.random.default_rng(0).normal(size=(16, 32 + 128 + 4)).astype(
        np.float32)
    np.save(tmp_path / "probe.npy", data)
    cfg = CN({"scene": "probe"})
    ds = Dataset(cfg=cfg, data_root=str(tmp_path))
    x1, x2, y1, y2 = ds[0]
    assert x1.shape == (16, 1) and x2.shape == (16, 31)
    assert y1.shape == (16, 128) and y2.shape == (16, 4)
    assert len(ds) == 16


def test_dataset_catalog():
    from nerf_replication_tpu.datasets.dataset_catalog import DatasetCatalog

    attrs = DatasetCatalog.get("SynTrain")
    assert attrs["split"] == "train"
    attrs["split"] = "x"  # copy semantics: mutation doesn't leak
    assert DatasetCatalog.get("SynTrain")["split"] == "train"


def test_profiling_timer():
    from nerf_replication_tpu.utils.profiling import (
        device_memory_stats,
        perf_timer,
    )

    t = perf_timer("test", quiet=True)
    with t:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        t.sync(x)
    assert t.total > 0 and t.count == 1
    stats = device_memory_stats()
    assert "bytes_in_use" in stats


def test_base_utils(tmp_path):
    from nerf_replication_tpu.utils.base_utils import (
        load_object,
        project,
        read_pickle,
        save_pickle,
    )

    save_pickle({"a": 1}, str(tmp_path / "x.pkl"))
    assert read_pickle(str(tmp_path / "x.pkl")) == {"a": 1}

    K = np.array([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
    RT = np.eye(4)[:3]
    pix = project(np.array([[0.0, 0.0, 2.0]]), K, RT)
    np.testing.assert_allclose(pix, [[50.0, 50.0]])

    sv = load_object("nerf_replication_tpu.train.recorder.SmoothedValue",
                     {"window_size": 5})
    assert sv.deque.maxlen == 5


def test_vis_utils():
    from nerf_replication_tpu.utils.vis_utils import compare_images, to_uint8

    gt = np.zeros((8, 8, 3), np.float32)
    pred = np.ones((8, 8, 3), np.float32) * 0.5
    strip = compare_images(gt, pred)
    assert strip.shape == (8, 24, 3)
    assert to_uint8(pred).dtype == np.uint8


def test_pipeline_sample_across_images():
    from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = 4.0
    K = np.array([[16.0, 0, 8], [0, 16, 8], [0, 0, 1]], np.float32)
    pipe = DeviceRayPipeline(images, poses, K, n_rays=256,
                             sample_across_images=True)
    batch = jax.jit(pipe.sample)(jax.random.key(0))
    assert batch["rays_o"].shape == (256, 3)
    assert np.isfinite(np.asarray(batch["colors"])).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch["rays_d"]), axis=-1), 1.0, rtol=1e-5)


def test_variant_spheres_deterministic_and_distinct():
    """8-scene sweep stand-ins: same name -> identical scene across
    processes; different names -> different geometry."""
    from nerf_replication_tpu.utils.synthetic_scene import variant_spheres

    a1 = variant_spheres("chair")
    a2 = variant_spheres("chair")
    b = variant_spheres("drums")
    assert a1 == a2
    assert a1 != b
    assert 6 <= len(a1) <= 9
    for center, radius, rgb, dens, amp, freq, phase in a1:
        assert 0.1 <= radius <= 0.55
        assert all(0.0 <= c <= 1.0 for c in rgb)
        assert dens > 100
