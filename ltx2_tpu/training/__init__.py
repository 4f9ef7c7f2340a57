from ltx2_tpu.training.trainer import (
    TrainBatch,
    TrainConfig,
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
    rectified_flow_loss,
    trainable_mask,
    zero1_opt_state_shardings,
    zero2_grad_shardings,
)

__all__ = [
    "TrainBatch",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "merge_params",
    "partition_params",
    "rectified_flow_loss",
    "trainable_mask",
    "zero1_opt_state_shardings",
    "zero2_grad_shardings",
]
