import jax.numpy as jnp
import numpy as np

from nerf_replication_tpu.config import CN
from nerf_replication_tpu.models.encoding import FrequencyEncoder, get_encoder


def test_freq_output_dim():
    enc = FrequencyEncoder(input_dim=3, freq=10)
    assert enc.output_dim == 63
    enc4 = FrequencyEncoder(input_dim=3, freq=4)
    assert enc4.output_dim == 27
    x = jnp.ones((5, 3))
    assert enc(x).shape == (5, 63)


def test_freq_values_and_order():
    enc = FrequencyEncoder(input_dim=2, freq=2)
    x = jnp.array([[0.5, -1.0]])
    out = np.asarray(enc(x))[0]
    # layout: [x, sin(1*x), cos(1*x), sin(2*x), cos(2*x)]
    expect = np.concatenate(
        [
            [0.5, -1.0],
            np.sin([0.5, -1.0]),
            np.cos([0.5, -1.0]),
            np.sin([1.0, -2.0]),
            np.cos([1.0, -2.0]),
        ]
    )
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_get_encoder_dispatch_frequency():
    enc = get_encoder(CN({"type": "frequency", "input_dim": 3, "freq": 6}))
    assert enc.output_dim == 3 * (1 + 12)


def test_freq_batch_shapes():
    enc = FrequencyEncoder(input_dim=3, freq=10)
    x = jnp.zeros((7, 11, 3))
    assert enc(x).shape == (7, 11, 63)


def test_get_encoder_dispatch_brick_backend():
    """The reference YAML name (cuda_hashgrid) + backend: brick resolves
    to a HashGridEncoder running the Pallas bricked kernels."""
    import jax

    enc = get_encoder(CN({
        "type": "cuda_hashgrid", "backend": "brick", "input_dim": 3,
        "num_levels": 3, "level_dim": 2, "base_resolution": 8,
        "desired_resolution": 32, "log2_bricks": 9,
        "bounds": [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]}))
    assert enc.backend == "brick"
    assert enc.output_dim == 6
    x = jax.random.uniform(jax.random.key(0), (32, 3), minval=-1, maxval=1)
    params = enc.init(jax.random.key(1), x)
    out = enc.apply(params, x)
    assert out.shape == (32, 6)
    assert bool(jnp.isfinite(out).all())
