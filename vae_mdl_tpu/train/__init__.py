from vae_mdl_tpu.train.schedule import staircase_schedule
from vae_mdl_tpu.train.state import TrainState, create_train_state, init_output_bias
from vae_mdl_tpu.train.steps import make_eval_step, make_train_step
from vae_mdl_tpu.train.trainer import Trainer, train

__all__ = [
    "staircase_schedule",
    "TrainState",
    "create_train_state",
    "init_output_bias",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "train",
]
