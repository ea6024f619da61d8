from vae_song_tpu.parallel.mesh import (
    init_multihost,
    make_mesh,
    replicate_state,
    shard_batch,
    make_dp_train_step,
    make_dp_eval_step,
)

__all__ = [
    "init_multihost",
    "make_mesh",
    "replicate_state",
    "shard_batch",
    "make_dp_train_step",
    "make_dp_eval_step",
]
