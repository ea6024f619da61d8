from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.steps import (
    make_train_step,
    make_eval_step,
    make_apply_fns,
    ENCODER_LR_LAMBDA,
)
from vae_song_tpu.train.loop import train_and_test, init_model, synth_run_name
from vae_song_tpu.train import checkpoint, loggers

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_apply_fns",
    "ENCODER_LR_LAMBDA",
    "train_and_test",
    "init_model",
    "synth_run_name",
    "checkpoint",
    "loggers",
]
