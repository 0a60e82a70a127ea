"""Batch collation (parity: src/datasets/collate_batch.py:7-12 — a
registry of task collators falling back to default stacking)."""

from __future__ import annotations

import numpy as np

_collators: dict[str, callable] = {}


def default_collate(samples: list) -> dict:
    """Stack a list of sample dicts into one batch dict of arrays,
    recursing into nested dicts (the behavior the reference gets from
    torch's default_collate)."""
    if not samples:
        return {}
    first = samples[0]
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (list, tuple)):
        return type(first)(default_collate(list(x)) for x in zip(*samples))
    return np.stack([np.asarray(s) for s in samples])


def make_collator(cfg, is_train: bool):
    name = cfg.train.collator if is_train else cfg.test.collator
    return _collators.get(name, default_collate)
