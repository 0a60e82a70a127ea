"""Unit tests for the forward-only eval encode kernel
(ops/pallas/eval_encode.py) against the training kernel and the brick
oracle — CPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_replication_tpu.ops.pallas import hashgrid_kernel as hk
from nerf_replication_tpu.ops.pallas.eval_encode import (
    brick_encode_eval,
    pack_eval_table,
)


@pytest.fixture(scope="module")
def setup():
    layout = hk.make_brick_layout(4, 4, 32, log2_bricks=5)
    key = jax.random.key(0)
    table = jax.random.uniform(key, (layout.n_rows, hk.ROW), jnp.float32,
                               -1.0, 1.0)
    x = jax.random.uniform(jax.random.key(1), (300, 3), jnp.float32)
    return layout, table, x


def test_pack_unpack_roundtrip(setup):
    _, table, _ = setup
    packed = pack_eval_table(table)
    assert packed.dtype == jnp.uint32
    assert packed.shape == (table.shape[0], 128)
    f0 = jax.lax.bitcast_convert_type(
        (packed & jnp.uint32(0xFFFF0000)), jnp.float32)
    f1 = jax.lax.bitcast_convert_type(packed << 16, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(f0), np.asarray(table[:, :128].astype(jnp.bfloat16)
                                   .astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(f1), np.asarray(table[:, 128:].astype(jnp.bfloat16)
                                   .astype(jnp.float32)))


@pytest.mark.parametrize("mxu_max", [0, 10 ** 9])
def test_eval_matches_training_forward(setup, mxu_max):
    """Scalar and all-MXU eval strategies must reproduce the training
    kernel's forward (both quantize table reads to bf16)."""
    layout, table, x = setup
    ref = np.asarray(hk.brick_hash_encode(layout, table, x))
    out = np.asarray(brick_encode_eval(layout, pack_eval_table(table), x,
                                       mxu_max_rows=mxu_max, blk=128))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_eval_matches_oracle(setup):
    """And the XLA brick oracle (f32 exact) within bf16 tolerance."""
    layout, table, x = setup
    oracle = np.asarray(hk.brick_encode_reference(layout, table, x))
    out = np.asarray(brick_encode_eval(layout, pack_eval_table(table), x,
                                       mxu_max_rows=0, blk=128))
    np.testing.assert_allclose(out, oracle, atol=2e-2, rtol=2e-2)


def test_ragged_n_points(setup):
    layout, table, _ = setup
    x = jax.random.uniform(jax.random.key(2), (77, 3), jnp.float32)
    out = brick_encode_eval(layout, pack_eval_table(table), x, blk=128)
    assert out.shape == (77, 2 * len(layout.scales))
