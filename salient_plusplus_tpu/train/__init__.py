from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step
from .pipeline import DeviceFeeder

__all__ = [
    "TrainState", "create_train_state",
    "make_train_step", "make_eval_step", "DeviceFeeder",
]
