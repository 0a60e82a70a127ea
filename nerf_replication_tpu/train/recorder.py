"""Training recorder (observability).

Capability parity with reference src/train/recorder.py: window-20
median/avg smoothing (SmoothedValue :10-37), tensorboard scalar + image
logging with identical tag layout ``<prefix>/<name>`` (:89-107),
step/epoch state for checkpointing (:109-119), log-dir wipe on fresh
runs (:55-57), and process-0-only side effects (:51,75,81,90 — here
``jax.process_index() == 0``).

Uses tensorboardX when available, else falls back to a JSONL writer so
headless environments still record.
"""

from __future__ import annotations

import os
import shutil
from collections import deque

import numpy as np


class SmoothedValue:
    """Window-smoothed scalar (reference recorder.py:10-37)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        value = float(value)
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class _JsonlWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "events.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        import json

        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()

    def add_image(self, tag, img, step, dataformats="HWC"):
        pass

    def close(self):
        self._f.close()


class Recorder:
    def __init__(self, cfg, process_index: int = 0):
        self.process_index = process_index
        self.log_dir = cfg.record_dir
        if process_index != 0:
            self.writer = None
        else:
            if not cfg.get("resume", True) and os.path.exists(self.log_dir):
                print(f"remove contents of directory {self.log_dir}")
                shutil.rmtree(self.log_dir, ignore_errors=True)
            os.makedirs(self.log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir=self.log_dir)
            except Exception:
                self.writer = _JsonlWriter(self.log_dir)

        # scalar state (reference recorder.py:60-73)
        self.step = 0
        self.epoch = 0
        self.loss_stats: dict[str, SmoothedValue] = {}
        self.batch_time = SmoothedValue()
        self.data_time = SmoothedValue()
        self.image_stats: dict = {}

    # -- updates (process-0 gated like the reference) -------------------------
    def update_loss_stats(self, loss_dict: dict):
        if self.process_index != 0:
            return
        for k, v in loss_dict.items():
            self.loss_stats.setdefault(k, SmoothedValue()).update(
                float(np.asarray(v).mean()))

    def update_image_stats(self, image_stats: dict):
        if self.process_index != 0:
            return
        self.image_stats.update(image_stats)

    def record(self, prefix: str, step: int = -1, loss_stats=None,
               image_stats=None):
        if self.process_index != 0 or self.writer is None:
            return
        step = step if step >= 0 else self.step
        stats = loss_stats if loss_stats is not None else self.loss_stats
        for k, v in stats.items():
            v = v.median if isinstance(v, SmoothedValue) else float(np.asarray(v).mean())
            self.writer.add_scalar(f"{prefix}/{k}", v, step)
        imgs = image_stats if image_stats is not None else self.image_stats
        for k, v in (imgs or {}).items():
            self.writer.add_image(f"{prefix}/{k}", np.asarray(v), step,
                                  dataformats="HWC")
        self.image_stats = {}

    # -- checkpoint state (reference recorder.py:109-119) --------------------
    def state_dict(self) -> dict:
        return {"step": self.step, "epoch": self.epoch}

    def load_state_dict(self, state: dict):
        self.step = int(state.get("step", 0))
        self.epoch = int(state.get("epoch", 0))

    def __str__(self):
        loss_state = "  ".join(
            f"{k}: {v.avg:.4f}" for k, v in self.loss_stats.items())
        return (f"epoch: {self.epoch}  step: {self.step}  {loss_state}  "
                f"batch: {self.batch_time.avg:.4f}  data: {self.data_time.avg:.4f}")


def make_recorder(cfg, process_index: int | None = None):
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    return Recorder(cfg, process_index)
