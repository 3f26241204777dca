from . import losses
from .loop import make_singleview_step_fns, make_twoview_step_fns
from .state import TrainState, create_train_state, make_optimizer

__all__ = [
    "losses",
    "make_singleview_step_fns",
    "make_twoview_step_fns",
    "TrainState",
    "create_train_state",
    "make_optimizer",
]
