"""Tiny end-to-end NeRF convergence test: a small MLP must learn the
procedural sphere scene well above the all-background baseline within a
few hundred steps. Guards the full train loop (device pipeline ->
hierarchical render -> grad -> optax) against quality regressions."""

import jax
import numpy as np
import pytest

from nerf_replication_tpu.config import default_cfg
from nerf_replication_tpu.datasets.nerf.blender import Dataset as BlenderDataset
from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline
from nerf_replication_tpu.models import make_network
from nerf_replication_tpu.models.nerf.network import init_params
from nerf_replication_tpu.train import make_trainer
from nerf_replication_tpu.train.recorder import Recorder
from nerf_replication_tpu.utils.synthetic_scene import generate_scene


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_scene(str(root), scene="probe", H=48, W=48,
                   n_train=8, n_val=1, n_test=1)
    return str(root)


def test_nerf_learns_scene(scene_root, tmp_path):
    cfg = default_cfg()
    cfg.scene = "probe"
    cfg.ep_iter = 150
    cfg.log_interval = 1000
    cfg.record_dir = str(tmp_path / "rec")
    cfg.task_arg.update({
        "N_rays": 256, "N_samples": 32, "N_importance": 32,
        "white_bkgd": True, "perturb": 1, "coarse_loss": True,
        "ray_chunk": 2304,
    })
    cfg.network.nerf = {"D": 4, "W": 64, "V_D": 1, "skips": [2]}
    cfg.network.xyz_encoder = {"type": "frequency", "input_dim": 3, "freq": 6}
    cfg.network.dir_encoder = {"type": "frequency", "input_dim": 3, "freq": 2}
    cfg.network.dtype = "float32"
    cfg.train.lr = 2e-3
    cfg.train.scheduler = {"type": "exponential", "gamma": 0.1,
                           "decay_epochs": 100}
    cfg.train_dataset = {"data_root": scene_root, "split": "train",
                         "input_ratio": 1.0, "H": 48, "W": 48}

    ds = BlenderDataset(cfg=cfg, **dict(cfg.train_dataset))
    images, poses, K = ds.as_arrays()
    pipe = DeviceRayPipeline(images, poses, K, n_rays=256)

    net = make_network(cfg)
    trainer = make_trainer(cfg, net)
    state = trainer.init_state(init_params(net, jax.random.key(0)))
    rec = Recorder(cfg, process_index=0)

    state = trainer.train_device(0, pipe, state, rec)
    psnr_150 = rec.loss_stats["psnr"].avg
    state = trainer.train_device(1, pipe, state, rec)
    psnr_300 = rec.loss_stats["psnr"].avg

    # must beat "predict white everywhere" (~8-10 dB on this scene) by a
    # clear margin and keep improving
    assert psnr_300 > 15.0, (psnr_150, psnr_300)
    assert psnr_300 > psnr_150 - 0.5

    # full-image eval through the renderer matches training quality-ish
    rgb, depth = trainer.wrapper.render_eval(
        state["params"],
        {"rays_o": pipe.rays_for_pose(pipe.poses[0])[0][None],
         "rays_d": pipe.rays_for_pose(pipe.poses[0])[1][None]})
    gt = np.asarray(images[0]).reshape(-1, 3)
    mse = float(np.mean((np.asarray(rgb) - gt) ** 2))
    psnr_img = -10 * np.log10(mse)
    assert psnr_img > 14.0, psnr_img
