"""Config defaults, parsing and CLI.

Capability parity with the reference config layer (`src/config/config.py`):
same YAML schema and keys, recursive ``parent_cfg`` inheritance, CLI
``opts`` overrides with an ``other_opts`` terminator, ``exp_name``
gitbranch/gitcommit substitution, and the
``<base>/<task>/<scene>/<exp_name>`` output-directory derivation
(reference config.py:134-196). Differences (deliberate):

* ``cfg`` is built lazily by :func:`make_cfg` — not an import-time global
  with import-time argparse (reference config.py:199-209). A compatible
  module-level ``cfg``/``args`` pair is still exported by
  ``nerf_replication_tpu.config`` for scripts that want it.
* ``*_module`` keys resolve through a registry (see
  ``nerf_replication_tpu.registry``) instead of ``imp.load_source`` file
  paths; the derived ``*_path`` keys are kept for compatibility.
* ``cfg.gpus`` is accepted but maps to JAX device selection, not
  ``CUDA_VISIBLE_DEVICES``.
"""

from __future__ import annotations

import argparse
import os
import subprocess

import numpy as np

from .cfg_node import CN


def default_cfg() -> CN:
    """Default config tree (reference config.py:8-131 capability set)."""
    c = CN()

    # mesh extraction (reference config.py:11-12)
    c.level = 32.0
    c.resolution = 256

    c.scene = "lego"
    c.pretrain_path = ""
    # default ON: the reference evaluator dumps view PNGs unconditionally
    # (src/evaluators/nerf.py:51-62 never checks its dead save_result
    # flag); we keep the knob but match the observable behavior
    c.save_result = True
    c.clear_result = False
    c.save_tag = "default"

    # pluggable modules (same YAML keys as the reference; values are
    # registry names, see registry.py)
    c.train_dataset_module = "src.datasets.nerf.blender"
    c.test_dataset_module = "src.datasets.nerf.blender"
    c.val_dataset_module = "src.datasets.nerf.blender"
    c.network_module = "src.models.nerf.network"
    c.renderer_module = "src.models.nerf.renderer.volume_renderer"
    c.loss_module = "src.train.trainers.nerf"
    c.evaluator_module = "src.evaluators.nerf"

    # experiment naming
    c.exp_name = "gitbranch_hello"
    c.exp_name_tag = ""
    c.pretrain = ""

    # distributed / devices
    c.distributed = False
    c.gpus = list(range(4))       # accepted for config compat; device count hint
    c.mesh = CN({"data": -1})     # -1 => all local devices on the data axis
    c.local_rank = 0

    c.task = "nerf-replication"
    c.resume = True

    # epochs / cadence (reference config.py:77-81)
    c.ep_iter = -1
    c.save_ep = 100000
    c.save_latest_ep = 1
    c.eval_ep = 1
    c.log_interval = 20
    c.skip_eval = False
    c.fix_random = False
    c.seed = 0

    c.task_arg = CN()

    # train
    c.train = CN()
    c.train.epoch = 10000
    c.train.num_workers = 8
    c.train.collator = "default"
    c.train.batch_sampler = "default"
    c.train.sampler_meta = CN()
    c.train.shuffle = True
    c.train.eps = 1e-8
    c.train.optim = "adam"
    c.train.lr = 5e-4
    c.train.weight_decay = 0.0
    c.train.scheduler = CN(
        {"type": "multi_step", "milestones": [80, 120, 200, 240], "gamma": 0.5}
    )
    c.train.batch_size = 4
    c.train.clip_grad_value = 40.0

    # test
    c.test = CN()
    c.test.batch_size = 1
    c.test.collator = "default"
    c.test.epoch = -1
    c.test.batch_sampler = "default"
    c.test.sampler_meta = CN()

    # output dirs (derived per-run in parse_cfg)
    c.trained_model_dir = "data/trained_model"
    c.trained_config_dir = "data/trained_config"
    c.clean_tag = "debug"
    c.record_dir = "data/record"
    c.result_dir = "data/result"

    # numerics: param dtype is float32; compute dtype for MLP matmuls
    c.network = CN()
    c.network.dtype = "bfloat16"

    return c


def _git_describe(args: list[str]) -> str:
    try:
        out = subprocess.run(
            ["git", "describe", *args],
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip()
    except Exception:
        return ""


def parse_cfg(cfg: CN, args) -> None:
    """Post-merge derivation (reference config.py:134-174 semantics)."""
    if len(cfg.task) == 0:
        raise ValueError("task must be specified")

    # normalize a bbox to a cube centered on its mean (config.py:143-150)
    if "bbox" in cfg:
        bbox = np.array(cfg.bbox, dtype=np.float64).reshape(2, 3)
        center = bbox.mean(axis=0)
        half = (bbox[1] - bbox[0]).max() / 2.0
        cfg.bbox = np.stack([center - half, center + half]).reshape(6).tolist()

    if len(cfg.exp_name_tag) != 0:
        cfg.exp_name = cfg.exp_name + "_" + cfg.exp_name_tag
    if "gitbranch" in cfg.exp_name:
        branch = _git_describe(["--all"])
        cfg.exp_name = cfg.exp_name.replace("gitbranch", branch[6:] if branch else "main")
    if "gitcommit" in cfg.exp_name:
        commit = _git_describe(["--tags", "--always"])
        cfg.exp_name = cfg.exp_name.replace("gitcommit", commit or "head")
    print("EXP NAME: ", cfg.exp_name)

    sub = os.path.join(cfg.task, cfg.scene, cfg.exp_name)
    cfg.trained_model_dir = os.path.join(cfg.trained_model_dir, sub)
    cfg.trained_config_dir = os.path.join(cfg.trained_config_dir, sub)
    cfg.record_dir = os.path.join(cfg.record_dir, sub)
    cfg.result_dir = os.path.join(cfg.result_dir, sub, cfg.save_tag)
    cfg.local_rank = getattr(args, "local_rank", 0)

    # *_module -> *_path compat keys (config.py:172-174)
    for key in [k for k in list(cfg.keys()) if "_module" in k]:
        cfg[key.replace("_module", "_path")] = cfg[key].replace(".", "/") + ".py"


def load_cfg_tree(cfg_file: str, base: CN) -> CN:
    """Merge ``cfg_file`` (with recursive ``parent_cfg``) into ``base``."""
    with open(cfg_file) as f:
        import yaml
        current = yaml.safe_load(f) or {}
    if "parent_cfg" in current:
        base = load_cfg_tree(current["parent_cfg"], base)
    base.merge_from_other(current)
    return base


def make_cfg(args) -> CN:
    cfg = default_cfg()
    if getattr(args, "type", ""):
        cfg.task = "run"
    cfg = load_cfg_tree(args.cfg_file, cfg)
    opts = list(getattr(args, "opts", []) or [])
    if "other_opts" in opts:
        opts = opts[: opts.index("other_opts")]
    cfg.merge_from_list(opts)
    parse_cfg(cfg, args)
    return cfg


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", default="configs/default.yaml", type=str)
    parser.add_argument("--test", action="store_true", dest="test", default=False)
    parser.add_argument("--type", type=str, default="")
    parser.add_argument("--det", type=str, default="")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def parse_args(argv=None):
    return make_parser().parse_args(argv)
