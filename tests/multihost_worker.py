"""Subprocess worker for tests/test_multihost.py — NOT a pytest file.

Runs one process of a 2-process jax.distributed CPU cluster through
the REAL multihost path: parallel.init_multihost -> make_mesh over the
global devices -> replicate_state (make_array_from_callback branch) ->
shard_batch (make_array_from_process_local_data branch) -> one DP
train step. Prints the step loss; the test compares it against the
single-process reference."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from vae_song_tpu.parallel import init_multihost

    init_multihost(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from vae_song_tpu.models import LRVAE
    from vae_song_tpu.parallel import (
        make_mesh, replicate_state, shard_batch, make_dp_train_step,
    )
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer

    n_global = jax.device_count()
    local = jax.local_device_count()
    assert n_global == nproc * local, (n_global, nproc, local)

    model = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                              encoder_type="mlp", decoder_type="mlp",
                              beta=0.01, alpha=0.01)
    # identical on every process (same seed) — the multihost contract
    X = np.random.default_rng(0).normal(
        size=(n_global * 4, 2)).astype(np.float32)
    params, bs = init_model(model, X[:8], seed=0)
    tx = make_optimizer(lr=1e-3)

    mesh = make_mesh(n_data=n_global, n_model=1)
    state = replicate_state(TrainState.create(params, bs, tx), mesh)
    step = make_dp_train_step(model, tx, mesh)

    # this process's LOCAL slice of the global batch
    per_proc = X.shape[0] // nproc
    x_local = X[pid * per_proc:(pid + 1) * per_proc]
    xg = shard_batch(jnp.asarray(x_local), mesh)
    state, metrics = step(state, xg, jnp.float32(1.0), jax.random.PRNGKey(0))
    print(f"MH_LOSS {float(metrics['loss']):.8f}", flush=True)


if __name__ == "__main__":
    main()
