"""Fused encode+MLP eval kernel (ops/pallas/fused_ngp.py) vs the Flax
network oracle, across the skip-concat placements the NeRFMLP supports:
an inner skip (split trunk matmul), a last-layer skip (split heads),
and no skip. The flagship hard_ngp shape (D=3, skips=[1]) is the
inner-skip case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_replication_tpu.config.cfg_node import CN
from nerf_replication_tpu.models.nerf.network import init_params, make_network
from nerf_replication_tpu.models.nerf.renderer.ngp_renderer import (
    make_ngp_eval_apply,
)


def _cfg(depth, skips, width=16):
    return CN({
        "task_arg": {"use_viewdirs": True},
        "network": {
            "dtype": "float32",
            "nerf": {"W": width, "D": depth, "V_D": 1, "skips": skips},
            "xyz_encoder": {
                "type": "cuda_hashgrid", "backend": "brick",
                "input_dim": 3, "num_levels": 3, "level_dim": 2,
                "base_resolution": 4, "desired_resolution": 16,
                "log2_hashmap_size": 10, "log2_bricks": 4,
                "bounds": [-1.2, -1.2, -1.2, 1.2, 1.2, 1.2],
            },
            "dir_encoder": {"type": "sphere_harmonics", "degree": 2},
        },
    })


@pytest.mark.parametrize("depth,skips", [
    (3, [1]),   # flagship shape: inner skip -> split trunk layer 2
    (2, [1]),   # skip after last trunk layer -> split alpha/feature heads
    (2, []),    # no skip
    (3, [0, 1]),  # consecutive skips: split trunk layers 1 AND 2
])
def test_fused_matches_network(depth, skips, monkeypatch):
    monkeypatch.setenv("NGP_FUSED", "1")
    net = make_network(_cfg(depth, skips))
    params = init_params(net, jax.random.key(0))
    apply_fn = make_ngp_eval_apply(net, params)
    assert apply_fn is not None
    pts = jax.random.uniform(jax.random.key(1), (9, 5, 3), jnp.float32,
                             -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(2), (9, 1, 3))
    raw_ref = net.apply(params, pts, dirs, model="fine")
    raw_fast = apply_fn(params, pts, dirs, "fine")
    assert raw_fast.shape == raw_ref.shape
    # bf16 table quantization is the only divergence (MLP runs f32/HI)
    np.testing.assert_allclose(np.asarray(raw_fast), np.asarray(raw_ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_env_off_falls_back(monkeypatch):
    """NGP_FUSED=0 must still produce the same numbers through the
    unfused encode-kernel + XLA-MLP chain."""
    net = make_network(_cfg(3, [1]))
    params = init_params(net, jax.random.key(0))
    pts = jax.random.uniform(jax.random.key(3), (4, 7, 3), jnp.float32,
                             -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(4), (4, 1, 3))
    monkeypatch.setenv("NGP_FUSED", "1")
    fused = make_ngp_eval_apply(net, params)(params, pts, dirs, "fine")
    monkeypatch.setenv("NGP_FUSED", "0")
    unfused = make_ngp_eval_apply(net, params)(params, pts, dirs, "fine")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-3, rtol=2e-3)


def test_eval_xla_oracle_matches_network(monkeypatch):
    """NGP_EVAL_XLA=1 (the CPU gate-repro path) routes the encode
    through the pure-XLA brick oracle; it must match the Flax network
    exactly (same math, no bf16 table quantization)."""
    monkeypatch.setenv("NGP_EVAL_XLA", "1")
    net = make_network(_cfg(3, [1]))
    params = init_params(net, jax.random.key(0))
    apply_fn = make_ngp_eval_apply(net, params)
    assert apply_fn is not None
    pts = jax.random.uniform(jax.random.key(7), (5, 6, 3), jnp.float32,
                             -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(8), (5, 1, 3))
    raw_ref = net.apply(params, pts, dirs, model="fine")
    raw = apply_fn(params, pts, dirs, "fine")
    np.testing.assert_allclose(np.asarray(raw), np.asarray(raw_ref),
                               atol=1e-5, rtol=1e-5)


def test_combined_gather_bitwise(monkeypatch):
    """The 256-lane combined corner gather (one take_along_axis per
    level over [f0 | f1]) must be BITWISE identical to the split
    two-gather formulation — same rows, same indices, same math."""
    monkeypatch.setenv("NGP_FUSED", "1")
    net = make_network(_cfg(3, [1]))
    params = init_params(net, jax.random.key(0))
    pts = jax.random.uniform(jax.random.key(5), (6, 11, 3), jnp.float32,
                             -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(6), (6, 1, 3))
    monkeypatch.setenv("NGP_FUSED_CGATHER", "1")
    a = make_ngp_eval_apply(net, params)(params, pts, dirs, "fine")
    monkeypatch.setenv("NGP_FUSED_CGATHER", "0")
    b = make_ngp_eval_apply(net, params)(params, pts, dirs, "fine")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
