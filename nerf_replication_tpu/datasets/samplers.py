"""Host-side index samplers.

Capability parity with reference src/datasets/samplers.py:

* :class:`IterationBasedBatchSampler` — wraps a batch sampler so one
  "epoch" is exactly ``num_iterations`` batches (``ep_iter`` semantics,
  samplers.py:50-72).
* :class:`DistributedSampler` — deterministic epoch-seeded shuffle,
  rank-sharded with padding to equal shard sizes (samplers.py:75-131);
  here "rank" is the JAX process index.
* :class:`ImageSizeBatchSampler` — seeded random (H, W) per batch for
  variable-size-crop training (samplers.py:10-47); kept for capability
  parity with the parent framework.

These are plain-Python iterables over index batches; no torch.
"""

from __future__ import annotations

import numpy as np


class SequentialSampler:
    def __init__(self, n: int):
        self.n = n

    def __iter__(self):
        return iter(range(self.n))

    def __len__(self):
        return self.n


class RandomSampler:
    def __init__(self, n: int, seed: int | None = None):
        self.n = n
        self._epoch = 0
        self._seed = seed

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self):
        seed = self._seed if self._seed is not None else self._epoch
        g = np.random.default_rng(seed + self._epoch)
        return iter(g.permutation(self.n).tolist())

    def __len__(self):
        return self.n


class DistributedSampler:
    """Rank-sharded deterministic sampler (reference samplers.py:75-131):
    epoch-seeded permutation, padded so every shard has equal length."""

    def __init__(self, n: int, num_replicas: int, rank: int, shuffle: bool = True):
        if rank >= num_replicas:
            raise ValueError(f"rank {rank} >= num_replicas {num_replicas}")
        self.n = n
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.num_samples = -(-n // num_replicas)
        self.total_size = self.num_samples * num_replicas
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self):
        if self.shuffle:
            g = np.random.default_rng(self._epoch)
            indices = g.permutation(self.n).tolist()
        else:
            indices = list(range(self.n))
        # pad to an even multiple (reference samplers.py:117-118)
        indices += indices[: self.total_size - len(indices)]
        return iter(indices[self.rank : self.total_size : self.num_replicas])

    def __len__(self):
        return self.num_samples


class BatchSampler:
    def __init__(self, sampler, batch_size: int, drop_last: bool = True):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)


class IterationBasedBatchSampler:
    """Yield exactly ``num_iterations`` batches, re-iterating (and
    re-seeding via set_epoch) the wrapped sampler as needed
    (reference samplers.py:50-72)."""

    def __init__(self, batch_sampler, num_iterations: int, start_iter: int = 0):
        self.batch_sampler = batch_sampler
        self.num_iterations = num_iterations
        self.start_iter = start_iter

    def __iter__(self):
        iteration = self.start_iter
        while iteration < self.num_iterations:
            if hasattr(self.batch_sampler.sampler, "set_epoch"):
                self.batch_sampler.sampler.set_epoch(iteration)
            for batch in self.batch_sampler:
                yield batch
                iteration += 1
                if iteration >= self.num_iterations:
                    break

    def __len__(self):
        return self.num_iterations


class ImageSizeBatchSampler:
    """Random (H, W) augmentation per batch (reference samplers.py:10-47):
    yields [(idx, h, w), ...] with h/w seeded-random multiples of 32."""

    def __init__(self, sampler, batch_size: int, drop_last: bool = False,
                 sampler_meta=None, seed: int = 0):
        meta = sampler_meta or {}
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.strategy = meta.get("strategy", "range")
        self.hmin, self.wmin = meta.get("min_hw", [256, 256])
        self.hmax, self.wmax = meta.get("max_hw", [480, 640])
        self.divisor = 32
        self._rng = np.random.default_rng(seed)

    def _generate_height_width(self):
        if self.strategy == "origin":
            return -1, -1
        h = self._rng.integers(self.hmin, self.hmax + 1)
        w = self._rng.integers(self.wmin, self.wmax + 1)
        h = (h | (self.divisor - 1)) + 1
        w = (w | (self.divisor - 1)) + 1
        return int(h), int(w)

    def __iter__(self):
        batch = []
        h, w = self._generate_height_width()
        for idx in self.sampler:
            batch.append((idx, h, w))
            if len(batch) == self.batch_size:
                yield batch
                h, w = self._generate_height_width()
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
