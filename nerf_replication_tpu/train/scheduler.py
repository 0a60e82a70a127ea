"""Learning-rate schedules.

Capability parity with reference src/train/scheduler.py:9-30 +
src/utils/optimizer/lr_scheduler.py:7-79: ``exponential``
(gamma^(epoch/decay_epochs)), ``multi_step`` and ``warmup_multi_step``
— expressed as pure step->lr functions (the reference steps a mutable
scheduler once per epoch; epoch = step // ep_iter reproduces that
exactly, including the integer-epoch granularity).

``set_lr_scheduler`` (reference scheduler.py:24-30, re-applying config
after resume) is a no-op here by construction: the schedule is a pure
function of the global step.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(cfg):
    tc = cfg.train
    base_lr = float(tc.lr)
    sc = tc.scheduler
    kind = sc.get("type", "multi_step")
    ep_iter = max(int(cfg.get("ep_iter", -1)), 1)

    if kind == "exponential":
        gamma = float(sc.get("gamma", 0.1))
        decay_epochs = float(sc.get("decay_epochs", 500))
        smooth = bool(sc.get("smooth", False))  # per-step decay option

        def schedule(step):
            epoch = step / ep_iter if smooth else step // ep_iter
            return base_lr * gamma ** (epoch / decay_epochs)

        return schedule

    if kind == "multi_step":
        milestones = jnp.asarray(sc.get("milestones", [80, 120, 200, 240]))
        gamma = float(sc.get("gamma", 0.5))

        def schedule(step):
            epoch = step // ep_iter
            return base_lr * gamma ** jnp.sum(milestones <= epoch)

        return schedule

    if kind == "warmup_multi_step":
        milestones = jnp.asarray(sc.get("milestones", [80, 120, 200, 240]))
        gamma = float(sc.get("gamma", 0.5))
        warmup_epochs = int(sc.get("warmup_epochs", sc.get("warmup_iters", 5)))
        warmup_factor = float(sc.get("warmup_factor", 1.0 / 3))

        def schedule(step):
            epoch = step // ep_iter
            alpha = jnp.clip(epoch / max(warmup_epochs, 1), 0.0, 1.0)
            wf = jnp.where(epoch >= warmup_epochs, 1.0,
                           warmup_factor * (1 - alpha) + alpha)
            return base_lr * wf * gamma ** jnp.sum(milestones <= epoch)

        return schedule

    raise ValueError(f"unknown scheduler type: {kind!r}")


def make_lr_scheduler(cfg, optimizer=None):
    """Reference-API name (src/train/__init__.py:3)."""
    return make_lr_schedule(cfg)


def set_lr_scheduler(cfg, scheduler):
    """Reference-API compat (scheduler.py:24-30): schedules here are pure
    functions of the step, so re-applying config is rebuilding them."""
    return make_lr_schedule(cfg)
