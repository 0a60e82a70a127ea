from .mesh import (
    data_sharded,
    make_dp_epoch_runner,
    make_dp_eval_render,
    make_dp_train_step,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh", "replicated", "data_sharded", "shard_batch",
    "replicate_tree", "make_dp_train_step", "make_dp_epoch_runner",
    "make_dp_eval_render",
]
