import os

import pytest

from nerf_replication_tpu.config import CN, default_cfg, load_cfg_tree, make_cfg, parse_args


def test_cn_attr_access_and_merge():
    c = CN({"a": 1, "b": {"c": 2.0}})
    assert c.a == 1 and c.b.c == 2.0
    c.merge_from_other({"b": {"c": 3}, "d": "x"})
    assert c.b.c == 3.0 and isinstance(c.b.c, float)  # int coerced to float
    assert c.d == "x"


def test_merge_from_list_typed():
    c = CN({"train": {"lr": 5e-4, "epoch": 10}, "flag": True})
    c.merge_from_list(["train.lr", "1e-3", "train.epoch", "20", "flag", "False"])
    assert c.train.lr == 1e-3
    assert c.train.epoch == 20
    assert c.flag is False


def test_merge_type_mismatch_raises():
    c = CN({"a": 1})
    with pytest.raises(ValueError):
        c.merge_from_list(["a", "[1,2]"])


def test_parent_cfg_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text("task: nerf-replication\ntrain:\n  lr: 0.01\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"parent_cfg: {parent}\ntrain:\n  epoch: 7\n")
    cfg = load_cfg_tree(str(child), default_cfg())
    assert cfg.train.lr == 0.01
    assert cfg.train.epoch == 7


def test_make_cfg_derives_dirs(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text(
        "task: nerf-replication\nscene: lego\nexp_name: nerf\n"
        "task_arg:\n  N_rays: 1024\n"
    )
    args = parse_args(["--cfg_file", str(f)])
    cfg = make_cfg(args)
    assert cfg.trained_model_dir == os.path.join(
        "data/trained_model", "nerf-replication", "lego", "nerf"
    )
    assert cfg.result_dir.endswith(os.path.join("lego", "nerf", "default"))
    assert cfg.task_arg.N_rays == 1024
    # *_module -> *_path compat derivation
    assert cfg.network_path == "src/models/nerf/network.py"


def test_opts_override_with_terminator(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("task: nerf-replication\n")
    args = parse_args(
        ["--cfg_file", str(f), "train.lr", "0.02", "other_opts", "junk", "x"]
    )
    cfg = make_cfg(args)
    assert cfg.train.lr == 0.02


def test_bbox_normalized_to_cube(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("task: t\nbbox: [0., 0., 0., 2., 4., 2.]\n")
    cfg = make_cfg(parse_args(["--cfg_file", str(f)]))
    lo, hi = cfg.bbox[:3], cfg.bbox[3:]
    side = [h - l for h, l in zip(hi, lo)]
    assert side == [4.0, 4.0, 4.0]
