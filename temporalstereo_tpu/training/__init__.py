from .optim import build_optimizer, build_schedule
from .state import TrainState
from .step import build_losses, compute_losses, make_eval_step, make_train_step

__all__ = [k for k in dir() if not k.startswith("_")]
