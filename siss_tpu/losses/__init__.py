from siss_tpu.losses.deletion import (
    DeletionLoss,
    DeletionLossOutputs,
    LOSS_FUNCTIONS,
    SCALAR_PATH_LOSSES,
    SHARED_FORWARD_LOSSES,
)

#: reference-API alias (``losses/ddpm_deletion_loss.py`` class name)
DDPMDeletionLoss = DeletionLoss

__all__ = [
    "DeletionLoss",
    "DDPMDeletionLoss",
    "DeletionLossOutputs",
    "LOSS_FUNCTIONS",
    "SCALAR_PATH_LOSSES",
    "SHARED_FORWARD_LOSSES",
]
