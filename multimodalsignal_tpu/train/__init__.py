from multimodalsignal_tpu.train.metrics import (
    accuracy,
    confusion_matrix,
    weighted_f1,
)
from multimodalsignal_tpu.train.optim import (
    EarlyStoppingState,
    PlateauState,
    early_stopping_init,
    early_stopping_update,
    make_optimizer,
    plateau_init,
    plateau_update,
)

__all__ = [
    "accuracy",
    "confusion_matrix",
    "weighted_f1",
    "make_optimizer",
    "EarlyStoppingState",
    "PlateauState",
    "early_stopping_init",
    "early_stopping_update",
    "plateau_init",
    "plateau_update",
]
