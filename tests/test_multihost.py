"""True multi-PROCESS validation of the distributed backend
(parallel/mesh.py): two jax.distributed CPU processes x 2 virtual
devices each form one 4-device DP mesh through init_multihost,
replicate_state's make_array_from_callback branch, and shard_batch's
make_array_from_process_local_data branch — the code paths a real
multi-host TPU pod takes, which in-process tests cannot reach.

The step loss from the cluster must equal the single-process
4-device DP loss on the same global batch bit-for-same-math."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process():
    port = _free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(HERE)] + sys.path
        ),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out}"
    finally:
        # if one worker failed or timed out, the OTHER is still blocked in
        # jax.distributed.initialize waiting for its peer — never leave it
        # pinning this 1-vCPU box for the rest of the suite
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MH_LOSS")]
        assert lines, out
        losses.append(float(lines[-1].split()[1]))
    # both processes see the same pmean'd loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process reference on the identical global mesh/batch
    from vae_song_tpu.models import LRVAE
    from vae_song_tpu.parallel import (
        make_mesh, replicate_state, shard_batch, make_dp_train_step,
    )
    from vae_song_tpu.train.loop import init_model
    from vae_song_tpu.train.state import TrainState, make_optimizer

    model = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                              encoder_type="mlp", decoder_type="mlp",
                              beta=0.01, alpha=0.01)
    X = np.random.default_rng(0).normal(size=(4 * 4, 2)).astype(np.float32)
    params, bs = init_model(model, X[:8], seed=0)
    tx = make_optimizer(lr=1e-3)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    state = replicate_state(TrainState.create(params, bs, tx), mesh)
    step = make_dp_train_step(model, tx, mesh)
    _, metrics = step(state, shard_batch(jnp.asarray(X), mesh),
                      jnp.float32(1.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
