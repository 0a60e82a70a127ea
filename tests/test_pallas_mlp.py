"""Pallas fused NeRF-MLP kernel: interpret-mode correctness on CPU.
(The compiled kernel is additionally verified against XLA on the real
TPU — max abs err ~2e-3 bf16; see ops/pallas/mlp_kernel.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_replication_tpu.config import default_cfg
from nerf_replication_tpu.models import make_network
from nerf_replication_tpu.models.nerf.network import init_params
from nerf_replication_tpu.ops.pallas.mlp_kernel import (
    fused_nerf_mlp,
    make_fused_apply,
    pack_nerf_params,
)


@pytest.fixture(scope="module")
def flagship():
    cfg = default_cfg()
    cfg.network.nerf = {"D": 8, "W": 256, "V_D": 1, "skips": [4]}
    cfg.network.xyz_encoder = {"type": "frequency", "input_dim": 3, "freq": 10}
    cfg.network.dir_encoder = {"type": "frequency", "input_dim": 3, "freq": 4}
    net = make_network(cfg)
    params = init_params(net, jax.random.key(0))
    return net, params


def test_pack_params_shapes(flagship):
    net, params = flagship
    packed = pack_nerf_params(params["params"]["fine"], 63, 27)
    assert packed["w0"].shape == (128, 256)       # 63 padded to 128
    assert packed["w5x"].shape == (128, 256)      # skip split: x half
    assert packed["w5h"].shape == (256, 256)      # skip split: h half
    assert packed["w_af"].shape == (256, 384)     # feature+alpha fused
    assert packed["wv_d"].shape == (128, 128)     # view 27 padded
    assert packed["w_rgb"].shape == (128, 128)


def test_fused_kernel_matches_xla_interpret(flagship, monkeypatch):
    net, params = flagship
    packed = pack_nerf_params(params["params"]["fine"], 63, 27)

    from nerf_replication_tpu.models.encoding.freq import freq_encode

    key = jax.random.key(1)
    pts = jax.random.uniform(key, (96, 3), minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(jax.random.key(2), (96, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pf = freq_encode(pts, 10)
    vf = freq_encode(dirs, 4)

    out = fused_nerf_mlp(packed, pf, vf, tile_n=32, interpret=True)
    ref = net.apply(params, pts[:, None, :], dirs[:, None, :],
                    model="fine")[:, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.02, rtol=0.05)  # bf16 kernel vs bf16 xla


def test_make_fused_apply_contract(flagship, monkeypatch):
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    net, params = flagship
    fused = make_fused_apply(net, params)
    assert fused is not None
    pts = jax.random.uniform(jax.random.key(0), (8, 4, 3))
    dirs = jnp.tile(jnp.array([[[0.0, 0.0, -1.0]]]), (8, 1, 1))
    out = fused(params, pts, dirs, "fine")
    assert out.shape == (8, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_make_fused_apply_rejects_nonstandard_arch():
    cfg = default_cfg()
    cfg.network.nerf = {"D": 4, "W": 128, "V_D": 1, "skips": [2]}
    cfg.network.xyz_encoder = {"type": "frequency", "input_dim": 3, "freq": 4}
    cfg.network.dir_encoder = {"type": "frequency", "input_dim": 3, "freq": 2}
    net = make_network(cfg)
    params = init_params(net, jax.random.key(0))
    assert make_fused_apply(net, params) is None  # W != 256


def test_enc_fused_kernel_matches_xla_interpret(flagship):
    """The encode-in-kernel variant (raw points/dirs in) must match the
    XLA network output."""
    from nerf_replication_tpu.ops.pallas.mlp_kernel import fused_nerf_mlp_enc

    net, params = flagship
    packed = pack_nerf_params(params["params"]["coarse"], 63, 27)
    pts = jax.random.uniform(jax.random.key(1), (70, 3),
                             minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(jax.random.key(2), (70, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    out = fused_nerf_mlp_enc(packed, pts, dirs, 10, 4, tile_n=32,
                             interpret=True)
    ref = net.apply(params, pts[:, None, :], dirs[:, None, :],
                    model="")[:, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.02, rtol=0.05)


def test_make_fused_apply_selects_enc_fusion_and_matches(flagship,
                                                         monkeypatch):
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    net, params = flagship
    apply_fn = make_fused_apply(net, params)
    assert apply_fn is not None
    pts = jax.random.uniform(jax.random.key(3), (8, 4, 3),
                             minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(jax.random.key(4), (8, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = apply_fn(None, pts, dirs, "fine")
    ref = net.apply(params, pts, dirs, model="fine")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.02, rtol=0.05)


def test_make_fused_apply_rejects_noncanonical(flagship):
    """view_depth=2 (views_1) must fall back to XLA (ADVICE r1)."""
    cfg = default_cfg()
    cfg.network.nerf = {"D": 8, "W": 256, "V_D": 2, "skips": [4]}
    cfg.network.xyz_encoder = {"type": "frequency", "input_dim": 3,
                               "freq": 10}
    cfg.network.dir_encoder = {"type": "frequency", "input_dim": 3,
                               "freq": 4}
    net = make_network(cfg)
    params = init_params(net, jax.random.key(0))
    assert make_fused_apply(net, params) is None


def test_frame_renderer_uses_fused_apply(flagship, monkeypatch):
    """enable_fused_mlp must route the FRAME renderer (the bench path)
    through the kernel, not just the chunk renderers."""
    monkeypatch.setenv("PALLAS_INTERPRET", "1")
    import numpy as np

    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        Renderer,
        RenderSettings,
    )
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose

    net, params = flagship
    s = RenderSettings(N_samples=4, N_importance=4, ray_chunk=32)
    r = Renderer(net, settings=s, mesh=None)
    xla_apply = r.apply_fn
    assert r.enable_fused_mlp(params)
    assert r.apply_fn is not xla_apply

    pose = look_at_pose(np.array([0.0, -4.0, 0.5], np.float32))
    img = np.asarray(r.make_frame_renderer(8, 8, 8.0)(params,
                                                      jnp.asarray(pose)))
    r2 = Renderer(net, settings=s, mesh=None)
    ref = np.asarray(r2.make_frame_renderer(8, 8, 8.0)(params,
                                                       jnp.asarray(pose)))
    np.testing.assert_allclose(img, ref, atol=0.02)
