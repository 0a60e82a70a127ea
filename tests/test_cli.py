"""CLI surface smoke tests: run.py staged harness + train.py, driven as
real subprocesses on CPU against a generated scene (the reference's
staged bring-up strategy, run.py:187-188)."""

import json
import os
import subprocess
import sys

import pytest

from nerf_replication_tpu.utils.synthetic_scene import generate_scene

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cli")
    generate_scene(str(wd / "data" / "nerf_synthetic"), scene="probe",
                   H=32, W=32, n_train=3, n_val=1, n_test=1)
    cfg = wd / "probe.yaml"
    cfg.write_text(f"""
parent_cfg: {ROOT}/configs/nerf/lego.yaml
scene: "probe"
exp_name: "cli"
task_arg:
  N_rays: 64
  N_samples: 8
  N_importance: 8
  ray_chunk: 1024
  precrop_iters: 0
network:
  dtype: "float32"
  nerf: {{W: 16, D: 2, V_D: 1, skips: [1]}}
  xyz_encoder: {{type: frequency, input_dim: 3, freq: 4}}
  dir_encoder: {{type: frequency, input_dim: 3, freq: 2}}
train_dataset: {{data_root: data/nerf_synthetic, split: train, input_ratio: 1., H: 32, W: 32}}
test_dataset: {{data_root: data/nerf_synthetic, split: test, input_ratio: 1., H: 32, W: 32}}
train:
  epoch: 1
ep_iter: 5
save_ep: 1
eval_ep: 10
save_latest_ep: 1
log_interval: 100
""")
    return wd


def _run(args, wd, timeout=300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % (args, os.path.join(ROOT, args[0]))
    )
    return subprocess.run([sys.executable, "-c", code], cwd=str(wd),
                          capture_output=True, text=True, timeout=timeout,
                          env=env)


def test_run_dataset(workdir):
    r = _run(["run.py", "--type", "dataset", "--cfg_file", "probe.yaml"],
             workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "rays_o shape:" in r.stdout


def test_run_input(workdir):
    r = _run(["run.py", "--type", "input", "--cfg_file", "probe.yaml"],
             workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "render ok" in r.stdout


def test_train_then_network_then_evaluate(workdir):
    r = _run(["train.py", "--cfg_file", "probe.yaml"], workdir, timeout=400)
    assert r.returncode == 0, r.stderr[-800:]
    assert "epoch 0" in r.stdout

    r = _run(["run.py", "--type", "network", "--cfg_file", "probe.yaml"],
             workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "psnr" in r.stdout

    r = _run(["run.py", "--type", "evaluate", "--cfg_file", "probe.yaml"],
             workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "fps:" in r.stdout
    assert "'ssim'" in r.stdout

    r = _run(["run.py", "--type", "mesh", "--cfg_file", "probe.yaml",
              "resolution", "24", "level", "1.0"], workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "mesh written" in r.stdout


def test_train_test_mode(workdir):
    r = _run(["train.py", "--test", "--cfg_file", "probe.yaml"], workdir)
    assert r.returncode == 0, r.stderr[-800:]
    assert "val:" in r.stdout


def test_evaluate_fast_render_freq(workdir):
    """fast_render is model-agnostic: the occupancy-raymarch frame path
    must also drive a frequency-encoder net (no NGP eval kernel), riding
    the renderer's XLA apply instead."""
    r = _run(["train.py", "--cfg_file", "probe.yaml"], workdir,
             timeout=400)
    assert r.returncode == 0, r.stderr[-800:]
    r = _run(["run.py", "--type", "evaluate", "--cfg_file", "probe.yaml",
              "task_arg.fast_render", "1",
              "task_arg.occ_resolution", "16",
              "task_arg.occ_sel_resolution", "32",
              "task_arg.fast_candidates", "8",
              "task_arg.fast_coarse", "4",
              "task_arg.fast_fine", "4",
              "task_arg.fast_capacity", "0.9",
              "task_arg.fast_occ_capacity", "0.9"],
             workdir, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    assert "occupancy grid" in r.stdout
    assert "'psnr'" in r.stdout


@pytest.fixture(scope="module")
def ngp_workdir(tmp_path_factory):
    """Brick-NGP variant of the CLI scene for the fast_render path."""
    wd = tmp_path_factory.mktemp("cli_ngp")
    generate_scene(str(wd / "data" / "nerf_synthetic"), scene="probe",
                   H=32, W=32, n_train=3, n_val=1, n_test=1)
    cfg = wd / "probe_ngp.yaml"
    cfg.write_text(f"""
parent_cfg: {ROOT}/configs/nerf/lego.yaml
scene: "probe"
exp_name: "cli_ngp"
task_arg:
  N_rays: 64
  N_samples: 8
  N_importance: 8
  ray_chunk: 512
  precrop_iters: 0
  density_activation: softplus
  finite_tail: True
  fast_render: 1
  occ_resolution: 16
  occ_sel_resolution: 32
  fast_candidates: 8
  fast_coarse: 4
  fast_fine: 4
  fast_capacity: 0.9
  fast_occ_capacity: 0.9
network:
  dtype: "float32"
  nerf: {{W: 16, D: 2, V_D: 1, skips: [1]}}
  xyz_encoder: {{type: cuda_hashgrid, backend: brick, input_dim: 3,
                num_levels: 3, level_dim: 2, base_resolution: 4,
                desired_resolution: 16, log2_hashmap_size: 10,
                log2_bricks: 4, bounds: [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]}}
  dir_encoder: {{type: sphere_harmonics, degree: 2}}
train_dataset: {{data_root: data/nerf_synthetic, split: train, input_ratio: 1., H: 32, W: 32}}
test_dataset: {{data_root: data/nerf_synthetic, split: test, input_ratio: 1., H: 32, W: 32}}
train:
  epoch: 1
ep_iter: 3
save_ep: 1
eval_ep: 10
save_latest_ep: 1
log_interval: 100
""")
    return wd


def test_evaluate_fast_render(ngp_workdir):
    """run.py --type evaluate with task_arg.fast_render=1 drives the
    occupancy-raymarch frame renderer (incl. the finer selection grid)
    from the CLI — the product surface for the bench's fast path."""
    r = _run(["train.py", "--cfg_file", "probe_ngp.yaml"], ngp_workdir,
             timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    r = _run(["run.py", "--type", "evaluate", "--cfg_file",
              "probe_ngp.yaml"], ngp_workdir, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    assert "occupancy grid" in r.stdout
    assert "fast frame renderer" in r.stdout or "fps:" in r.stdout
    assert "'psnr'" in r.stdout


def test_eval_scenes_survives_scene_failure(workdir, tmp_path):
    """One scene's train failure records an error row; the sweep still
    writes its table (scripts/eval_scenes.py --base_cfg path)."""
    out = tmp_path / "sweep.json"
    r = _run(["scripts/eval_scenes.py", "--scenes", "nosuchscene",
              "--base_cfg", "configs/nerf/sweep_ngp.yaml", "--train",
              "--out", str(out)], workdir, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    table = json.loads((workdir / str(out)).read_text()
                       if not out.is_absolute() else out.read_text())
    assert "error" in table["nosuchscene"]


def test_eval_scenes_resumes_partial_sweep(workdir, tmp_path):
    """Re-entrancy: finished scenes are kept and skipped, error rows are
    retried, and the table persists after every scene (a mid-queue
    outage preserves completed work)."""
    out = tmp_path / "sweep.json"
    out.write_text(json.dumps({"alpha": {"psnr": 33.3},
                               "beta": {"error": "old failure"}}))
    r = _run(["scripts/eval_scenes.py", "--scenes", "alpha", "beta",
              "--base_cfg", "configs/nerf/sweep_ngp.yaml", "--train",
              "--out", str(out)], workdir, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    assert "skip alpha" in r.stdout
    table = json.loads(out.read_text())
    assert table["alpha"] == {"psnr": 33.3}          # kept, not re-run
    assert table["beta"].get("error") != "old failure"  # retried
