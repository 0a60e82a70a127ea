"""Optimizer factory.

Capability parity with reference src/train/optimizer.py:5-28 ({adam,
radam, sgd} with lr/weight-decay) + the trainer's
``clip_grad_value_(40)`` (trainer.py:59), composed as one optax chain so
the whole update runs inside the jitted train step.

The learning-rate schedule is injected as a step-based optax schedule
(see scheduler.py) instead of a mutable host-side scheduler object.
"""

from __future__ import annotations

import optax

from .scheduler import make_lr_schedule


def make_optimizer(cfg, params=None, lr_schedule=None) -> optax.GradientTransformation:
    tc = cfg.train
    if lr_schedule is None:
        lr_schedule = make_lr_schedule(cfg)
    wd = float(tc.get("weight_decay", 0.0))
    eps = float(tc.get("eps", 1e-8))
    kind = tc.get("optim", "adam")

    if kind == "adam":
        opt = (optax.adamw(lr_schedule, eps=eps, weight_decay=wd)
               if wd > 0 else optax.adam(lr_schedule, eps=eps))
    elif kind == "radam":
        opt = optax.radam(lr_schedule, eps=eps)
        if wd > 0:
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
    elif kind == "sgd":
        opt = optax.sgd(lr_schedule, momentum=tc.get("momentum", 0.9))
        if wd > 0:
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
    else:
        raise ValueError(f"unknown optimizer: {kind!r}")

    clip = float(tc.get("clip_grad_value", 40.0))
    if clip > 0:
        # element-wise value clip, matching torch clip_grad_value_
        return optax.chain(optax.clip(clip), opt)
    return opt
