from . import multihost
from .mesh import data_sharding, make_mesh, replicated, shard_batch
from .sharded_train import (
    make_param_shardings,
    make_sharded_multi_train_step,
    make_sharded_train_step,
    shard_batch_stack,
    shard_train_state,
    sharding_rules_for_mlp_tp,
    train_state_shardings,
)
from .shardmap_train import make_shardmap_train_step

__all__ = [
    "multihost",
    "data_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "make_param_shardings",
    "make_sharded_multi_train_step",
    "make_sharded_train_step",
    "shard_batch_stack",
    "make_shardmap_train_step",
    "shard_train_state",
    "sharding_rules_for_mlp_tp",
    "train_state_shardings",
]
