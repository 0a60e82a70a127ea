"""Behavioral parity: optax.radam vs the reference's vendored RAdam.

The reference ships its own buffer-based RAdam
(src/utils/optimizer/radam.py:80-125): per step it computes
N_sma = N_max - 2t*beta2^t/(1-beta2^t); when N_sma >= 5 the update is
rectified Adam (variance-corrected step size), otherwise
(degenerated_to_sgd=True) it is bias-corrected SGD-momentum. Our
optimizer factory maps cfg ``radam`` to ``optax.radam``
(train/optimizer.py:31). This test re-implements the vendored math in
numpy and asserts optax follows the SAME trajectory across the branch
boundary (with beta2=0.999 steps 1-5 take the SGD branch, step 6+ the
rectified branch).
"""

import math

import jax.numpy as jnp
import numpy as np
import optax


def _reference_radam_trajectory(w0, grad_fn, n_steps, lr, b1, b2, eps):
    w = w0.copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    traj = []
    for t in range(1, n_steps + 1):
        g = grad_fn(w)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        b2t = b2 ** t
        n_max = 2 / (1 - b2) - 1
        n_sma = n_max - 2 * t * b2t / (1 - b2t)
        if n_sma >= 5:
            step = math.sqrt(
                (1 - b2t) * (n_sma - 4) / (n_max - 4) * (n_sma - 2)
                / n_sma * n_max / (n_max - 2)) / (1 - b1 ** t)
            w = w - step * lr * m / (np.sqrt(v) + eps)
        else:  # degenerated_to_sgd branch (radam.py:102-104)
            step = 1.0 / (1 - b1 ** t)
            w = w - step * lr * m
        traj.append(w.copy())
    return traj


def test_optax_radam_matches_vendored_reference():
    lr, b1, b2, eps = 1e-2, 0.9, 0.999, 1e-8
    c = np.array([1.0, -2.0, 0.5])
    grad_fn = lambda w: w - c          # f = 0.5 ||w - c||^2
    w0 = np.zeros(3)

    ref = _reference_radam_trajectory(w0, grad_fn, 12, lr, b1, b2, eps)

    opt = optax.radam(lr, b1=b1, b2=b2, eps=eps)
    w = jnp.asarray(w0, jnp.float32)
    state = opt.init(w)
    for t in range(12):
        up, state = opt.update(w - jnp.asarray(c, jnp.float32), state, w)
        w = optax.apply_updates(w, up)
        tol = 1e-6 if t < 5 else 1e-4   # f32 sqrt noise on the
        #                                 rectified branch
        np.testing.assert_allclose(np.asarray(w), ref[t], atol=tol), t


def test_branch_boundary_location():
    """With beta2=0.999 the rectified branch engages exactly at step 6
    (N_sma crosses 5 between t=5 and t=6) — the trajectory check above
    is only meaningful if both branches are actually exercised."""
    b2 = 0.999
    n_max = 2 / (1 - b2) - 1
    n_sma = lambda t: n_max - 2 * t * (b2 ** t) / (1 - b2 ** t)
    assert n_sma(5) < 5 < n_sma(6)
