"""Round-trip test for the original-NeRF Keras weight loader
(models/nerf/network.py load_weights_from_keras; reference
src/models/nerf/network.py:76-123).

The original NeRF TF/Keras checkpoints are a flat list
[pts_0 W, pts_0 b, ..., pts_{D-1} W, b, feature W, b, views_0 W, b,
rgb W, b, alpha W, b] with (in, out)-shaped kernels. We construct a
synthetic list in that layout, load it, and assert the Flax forward
matches an independent numpy implementation of the paper MLP.
"""

import jax.numpy as jnp
import numpy as np

from nerf_replication_tpu.models.nerf.network import (
    NeRFMLP,
    load_weights_from_keras,
)

D = 8
W = 32
IN = 63      # freq-10 xyz encoding: 3 + 3*2*10
VIEW = 27    # freq-4 dir encoding: 3 + 3*2*4
SKIP = 4


def _keras_weight_list(rng):
    """Random weights in the original-NeRF flat Keras layout."""
    ws = []
    in_dim = IN
    for i in range(D):
        ws += [rng.normal(size=(in_dim, W)) * 0.2, rng.normal(size=(W,))]
        in_dim = W + (IN if i == SKIP else 0)
    ws += [rng.normal(size=(W, W)) * 0.2, rng.normal(size=(W,))]       # feature
    ws += [rng.normal(size=(W + VIEW, W // 2)) * 0.2,
           rng.normal(size=(W // 2,))]                                 # views_0
    ws += [rng.normal(size=(W // 2, 3)) * 0.2, rng.normal(size=(3,))]  # rgb
    ws += [rng.normal(size=(W, 1)) * 0.2, rng.normal(size=(1,))]       # alpha
    return [w.astype(np.float32) for w in ws]


def _numpy_forward(ws, x, v):
    """Independent oracle of the paper MLP (8 layers, skip concat of the
    encoded input after layer 4, density head off the trunk, view branch
    feature->concat(dirs)->W/2->rgb; reference network.py:22-47)."""
    relu = lambda a: np.maximum(a, 0.0)
    h = x
    for i in range(D):
        h = relu(h @ ws[2 * i] + ws[2 * i + 1])
        if i == SKIP:
            h = np.concatenate([x, h], axis=-1)
    base = 2 * D
    feat = h @ ws[base] + ws[base + 1]
    sigma = h @ ws[base + 6] + ws[base + 7]
    h2 = relu(np.concatenate([feat, v], axis=-1) @ ws[base + 2]
              + ws[base + 3])
    rgb = h2 @ ws[base + 4] + ws[base + 5]
    return np.concatenate([rgb, sigma], axis=-1)


def test_keras_roundtrip_forward_matches_oracle():
    rng = np.random.default_rng(7)
    ws = _keras_weight_list(rng)
    params = load_weights_from_keras(ws, depth=D)

    mlp = NeRFMLP(depth=D, width=W, view_depth=1, skips=(SKIP,),
                  use_viewdirs=True, dtype=jnp.float32)
    x = rng.normal(size=(17, IN)).astype(np.float32)
    v = rng.normal(size=(17, VIEW)).astype(np.float32)
    raw = np.asarray(mlp.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(v)))
    ref = _numpy_forward(ws, x, v)
    np.testing.assert_allclose(raw, ref, rtol=1e-5, atol=1e-5)


def test_keras_list_layout_lengths():
    """The loader consumes exactly 2*depth + 8 arrays and maps the tail
    in (feature, views_0, rgb, alpha) order."""
    rng = np.random.default_rng(0)
    ws = _keras_weight_list(rng)
    assert len(ws) == 2 * D + 8
    params = load_weights_from_keras(ws, depth=D)
    assert params["feature"]["kernel"].shape == (W, W)
    assert params["views_0"]["kernel"].shape == (W + VIEW, W // 2)
    assert params["rgb"]["kernel"].shape == (W // 2, 3)
    assert params["alpha"]["kernel"].shape == (W, 1)
    np.testing.assert_array_equal(np.asarray(params["pts_0"]["kernel"]),
                                  ws[0])
