from qpwcnet_tpu.train.losses import (
    multiscale_flow_loss,
    flow_mse_loss,
    flow_finetune_loss,
    auto_resize_mse_loss,
    multiscale_interp_loss,
    epe_error,
    l2_regularization,
)
from qpwcnet_tpu.train.agc import adaptive_clip_grads, agc, zero_nan_grads
from qpwcnet_tpu.train.train_state import (
    TrainState,
    create_flow_train_state,
    create_interp_train_state,
    make_flow_train_step,
    make_interp_train_step,
    recalibrate_batch_stats,
)

__all__ = [
    "multiscale_flow_loss",
    "flow_mse_loss",
    "flow_finetune_loss",
    "auto_resize_mse_loss",
    "multiscale_interp_loss",
    "epe_error",
    "l2_regularization",
    "adaptive_clip_grads",
    "agc",
    "zero_nan_grads",
    "TrainState",
    "create_flow_train_state",
    "create_interp_train_state",
    "make_flow_train_step",
    "make_interp_train_step",
    "recalibrate_batch_stats",
]
