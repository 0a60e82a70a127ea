"""Dataset layer tests: synthetic scene generation, blender loader,
samplers, device pipeline (reference `run.py --type dataset` equivalent)."""

import json
import os

import jax
import numpy as np
import pytest

from nerf_replication_tpu.config import default_cfg
from nerf_replication_tpu.datasets import make_data_loader
from nerf_replication_tpu.datasets.nerf.blender import Dataset as BlenderDataset
from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline, rays_for_camera
from nerf_replication_tpu.datasets.samplers import (
    DistributedSampler,
    IterationBasedBatchSampler,
    BatchSampler,
    SequentialSampler,
)
from nerf_replication_tpu.utils.synthetic_scene import generate_scene


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_scene(str(root), scene="probe", H=40, W=40,
                   n_train=3, n_val=1, n_test=2)
    return str(root)


def _cfg(scene_root):
    cfg = default_cfg()
    cfg.scene = "probe"
    cfg.task_arg.N_rays = 128
    cfg.train_dataset = {"data_root": scene_root, "split": "train",
                         "input_ratio": 1.0, "cams": [0, -1, 1], "H": 40, "W": 40}
    cfg.test_dataset = {"data_root": scene_root, "split": "test",
                        "input_ratio": 0.5, "cams": [0, -1, 1], "H": 40, "W": 40}
    cfg.train.batch_size = 1
    return cfg


def test_scene_generator_schema(scene_root):
    sd = os.path.join(scene_root, "probe")
    with open(os.path.join(sd, "transforms_train.json")) as f:
        meta = json.load(f)
    assert "camera_angle_x" in meta and len(meta["frames"]) == 3
    fp = meta["frames"][0]["file_path"]
    assert os.path.exists(os.path.join(sd, fp + ".png"))
    # test split ships depth + normal like NeRF-synthetic
    with open(os.path.join(sd, "transforms_test.json")) as f:
        tmeta = json.load(f)
    tfp = tmeta["frames"][0]["file_path"]
    assert os.path.exists(os.path.join(sd, tfp + "_depth_0001.png"))
    assert os.path.exists(os.path.join(sd, tfp + "_normal_0001.png"))


def test_blender_train_batch(scene_root):
    cfg = _cfg(scene_root)
    ds = BlenderDataset(cfg=cfg, **dict(cfg.train_dataset))
    assert len(ds) == 3
    item = ds[0]
    assert item["rays_o"].shape == (128, 3)
    assert item["rays_d"].shape == (128, 3)
    assert item["colors"].shape == (128, 3)
    np.testing.assert_allclose(
        np.linalg.norm(item["rays_d"], axis=-1), 1.0, rtol=1e-5)
    assert item["colors"].min() >= 0 and item["colors"].max() <= 1


def test_blender_test_full_image_with_depth_normal(scene_root):
    cfg = _cfg(scene_root)
    ds = BlenderDataset(cfg=cfg, **dict(cfg.test_dataset))
    item = ds[0]
    # input_ratio 0.5: 20x20
    assert item["rays_o"].shape == (400, 3)
    assert int(item["H"]) == 20 and int(item["W"]) == 20
    assert "depth" in item and "normal" in item
    assert item["normal"].shape == (400, 3)


def test_blender_alpha_composited_white(scene_root):
    cfg = _cfg(scene_root)
    ds = BlenderDataset(cfg=cfg, **dict(cfg.test_dataset))
    img = ds.images[0]
    # border pixels are empty space -> composited to white
    assert img[0, 0].min() > 0.99


def test_blender_cams_selection(scene_root):
    cfg = _cfg(scene_root)
    kw = dict(cfg.train_dataset)
    kw["cams"] = [0, -1, 2]
    ds = BlenderDataset(cfg=cfg, **kw)
    assert len(ds) == 2  # frames 0, 2


def test_make_data_loader_end_to_end(scene_root):
    cfg = _cfg(scene_root)
    loader = make_data_loader(cfg, is_train=True, max_iter=4)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["rays_o"].shape == (1, 128, 3)  # batch dim from collate
    assert b["colors"].shape == (1, 128, 3)


def test_distributed_sampler_shards_and_pads():
    n = 10
    all_indices = []
    for rank in range(4):
        s = DistributedSampler(n, num_replicas=4, rank=rank, shuffle=True)
        s.set_epoch(3)
        idx = list(s)
        assert len(idx) == 3  # ceil(10/4)
        all_indices += idx
    assert set(all_indices) == set(range(10))  # covers everything
    # deterministic across calls for the same epoch
    s0 = DistributedSampler(n, 4, 0)
    s0.set_epoch(3)
    s1 = DistributedSampler(n, 4, 0)
    s1.set_epoch(3)
    assert list(s0) == list(s1)


def test_iteration_based_sampler_exact_count():
    bs = BatchSampler(SequentialSampler(3), 1, drop_last=False)
    it = IterationBasedBatchSampler(bs, num_iterations=7)
    assert len(list(it)) == 7


def test_device_pipeline_sampling(scene_root):
    cfg = _cfg(scene_root)
    ds = BlenderDataset(cfg=cfg, **dict(cfg.train_dataset))
    images, poses, K = ds.as_arrays()
    pipe = DeviceRayPipeline(images, poses, K, n_rays=64,
                             precrop_iters=10, precrop_frac=0.5)
    batch = jax.jit(pipe.sample)(jax.random.key(0), 100)
    assert batch["rays_o"].shape == (64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch["rays_d"]), axis=-1), 1.0, rtol=1e-5)
    # precrop: at step 0 rays come from the image center region, so their
    # angular spread is smaller than full-image sampling at step 100
    b0 = jax.jit(pipe.sample)(jax.random.key(0), 0)
    spread = lambda b: float(np.std(np.asarray(b["rays_d"]), axis=0).sum())
    assert spread(b0) < spread(batch)


def test_device_pipeline_matches_host_rays(scene_root):
    """Device ray generation must agree with the host (blender) rays."""
    cfg = _cfg(scene_root)
    ds = BlenderDataset(cfg=cfg, **dict(cfg.test_dataset))
    images, poses, K = ds.as_arrays()
    item = ds[1]
    rays_o, rays_d = rays_for_camera(poses[1], ds.H, ds.W, ds.focal)
    np.testing.assert_allclose(np.asarray(rays_o), item["rays_o"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays_d), item["rays_d"], atol=1e-5)


def test_img_fit_dataset(scene_root):
    from nerf_replication_tpu.datasets.img_fit.synthetic import Dataset as ImgFit

    cfg = default_cfg()
    cfg.scene = "probe"
    cfg.task_arg.N_pixels = 256
    ds = ImgFit(cfg=cfg, data_root=scene_root, split="train", view=0,
                input_ratio=1.0)
    item = ds[0]
    assert item["uv"].shape == (256, 2)
    assert item["rgb"].shape == (256, 3)
    assert 0 <= item["uv"].min() and item["uv"].max() <= 1
    ds_test = ImgFit(cfg=cfg, data_root=scene_root, split="test", view=0,
                     input_ratio=1.0)
    full = ds_test[0]
    assert full["uv"].shape == (40 * 40, 2)
    assert int(full["meta"]["H"]) == 40


def test_make_data_loader_distributed_shards_disjointly(scene_root):
    """is_distributed loaders at num_replicas=2 cover the test split with
    disjoint (modulo padding) per-rank image ids — the reference's eval
    sharding via DistributedSampler (samplers.py:75-131)."""
    cfg = _cfg(scene_root)
    ids = {}
    for rank in range(2):
        loader = make_data_loader(cfg, is_train=False, is_distributed=True,
                                  num_replicas=2, rank=rank)
        ids[rank] = [int(np.asarray(b["id"]).ravel()[0]) for b in loader]
    n_views = len(make_data_loader(cfg, is_train=False))
    assert len(ids[0]) == len(ids[1]) == -(-n_views // 2)
    assert set(ids[0] + ids[1]) == set(range(n_views))
