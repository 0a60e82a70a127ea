"""Train package (parity: src/train/__init__.py:1-4 exports
make_trainer, make_optimizer, make_lr_scheduler, set_lr_scheduler,
make_recorder)."""

from . import trainers  # noqa: F401 (registry side effects)
from .optimizer import make_optimizer
from .recorder import Recorder, SmoothedValue, make_recorder
from .scheduler import make_lr_schedule, make_lr_scheduler, set_lr_scheduler
from .trainers.trainer import Trainer, make_trainer

__all__ = [
    "make_trainer", "Trainer", "make_optimizer", "make_lr_schedule",
    "make_lr_scheduler", "set_lr_scheduler", "make_recorder", "Recorder",
    "SmoothedValue",
]
