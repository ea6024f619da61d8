from vae_song_tpu.parallel.mesh import (
    init_multihost,
    make_mesh,
    replicate_state,
    shard_batch,
    make_dp_train_step,
    make_dp_eval_step,
)
from vae_song_tpu.parallel.sp import (
    make_sp_mesh,
    shard_points,
    make_sp_train_step,
    make_sp_eval_step,
)
from vae_song_tpu.parallel.pp import (
    make_pp_mesh,
    make_pp_apply,
    make_pp_train_step,
    shard_pp_state,
    stack_block_params,
    scan_blocks,
)
from vae_song_tpu.parallel.ep import (
    MoEParams,
    init_moe,
    make_ep_mesh,
    make_ep_apply,
    make_ep_train_step,
    moe_ffn_dense,
    shard_moe,
    shard_moe_opt,
)

__all__ = [
    "init_multihost",
    "make_mesh",
    "replicate_state",
    "shard_batch",
    "make_dp_train_step",
    "make_dp_eval_step",
    "make_sp_mesh",
    "shard_points",
    "make_sp_train_step",
    "make_sp_eval_step",
    "make_pp_mesh",
    "make_pp_apply",
    "make_pp_train_step",
    "shard_pp_state",
    "stack_block_params",
    "scan_blocks",
    "MoEParams",
    "init_moe",
    "make_ep_mesh",
    "make_ep_apply",
    "make_ep_train_step",
    "moe_ffn_dense",
    "shard_moe",
    "shard_moe_opt",
]
