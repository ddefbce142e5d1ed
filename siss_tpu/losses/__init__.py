from siss_tpu.losses.deletion import (
    DeletionLoss,
    DeletionLossOutputs,
    LOSS_FUNCTIONS,
    SCALAR_PATH_LOSSES,
    SHARED_FORWARD_LOSSES,
)

__all__ = [
    "DeletionLoss",
    "DeletionLossOutputs",
    "LOSS_FUNCTIONS",
    "SCALAR_PATH_LOSSES",
    "SHARED_FORWARD_LOSSES",
]
