from torchmdnet_tpu.train.loss import LOSS_FUNCTIONS, masked_l1, masked_mse  # noqa: F401
from torchmdnet_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
)
