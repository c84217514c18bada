"""Training infrastructure: config, optimizer, steps, distribution, loops."""
from rendernet_tpu.train.config import TrainConfig
from rendernet_tpu.train.optim import make_optimizer, exponential_staircase
from rendernet_tpu.train.distributed import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
from rendernet_tpu.train.steps import (
    TrainState,
    create_shader_state,
    make_shader_train_step,
    make_shader_eval_step,
    create_texture_state,
    make_texture_train_step,
    shader_loss_from_images,
)
from rendernet_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    save_params_npz,
    load_params_npz,
)

__all__ = [
    "TrainConfig",
    "make_optimizer",
    "exponential_staircase",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "TrainState",
    "create_shader_state",
    "make_shader_train_step",
    "make_shader_eval_step",
    "create_texture_state",
    "make_texture_train_step",
    "shader_loss_from_images",
    "save_checkpoint",
    "restore_checkpoint",
    "save_params_npz",
    "load_params_npz",
]
