"""Multi-device DP tests on the 8-way virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.models import VanillaVAE, LRVAE
from vae_song_tpu.parallel import (
    make_mesh,
    replicate_state,
    shard_batch,
    make_dp_train_step,
    make_dp_eval_step,
)
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.loop import init_model


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _make_state(model, x, tx):
    params, batch_stats = init_model(model, x, seed=0)
    return TrainState.create(params, batch_stats, tx)


def test_dp_train_step_runs_and_reduces(key):
    mesh = make_mesh()  # 8 x 1
    m = VanillaVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp", beta=0.1)
    x = np.random.default_rng(0).normal(size=(64, 2)).astype(np.float32)
    tx = make_optimizer(lr=1e-3)
    state = replicate_state(_make_state(m, x[:8], tx), mesh)
    step = make_dp_train_step(m, tx, mesh)

    xs = shard_batch(jnp.asarray(x), mesh)
    # the step donates its input state — snapshot params before stepping
    params_before = jax.tree.map(lambda v: np.asarray(v).copy(), state.params)
    state2, metrics = step(state, xs, jnp.float32(0.0), key)
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), params_before, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0

    # a second step compiles nothing new and still works
    state3, metrics3 = step(state2, xs, jnp.float32(0.0), jax.random.fold_in(key, 1))
    assert np.isfinite(float(metrics3["loss"]))


def test_dp_staged_lrvae(key):
    mesh = make_mesh()
    m = LRVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp",
                          beta=0.1, alpha=0.1)
    x = np.random.default_rng(1).normal(size=(64, 2)).astype(np.float32)
    tx = make_optimizer(lr=1e-3)
    state = replicate_state(_make_state(m, x[:8], tx), mesh)
    step = make_dp_train_step(m, tx, mesh)
    xs = shard_batch(jnp.asarray(x), mesh)
    state2, metrics = step(state, xs, jnp.float32(1.0), key)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["lr"]) > 0


def test_dp_eval_step(key):
    mesh = make_mesh()
    m = VanillaVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp", beta=0.1)
    x = np.random.default_rng(2).normal(size=(32, 2)).astype(np.float32)
    tx = make_optimizer(lr=1e-3)
    state = replicate_state(_make_state(m, x[:8], tx), mesh)
    ev = make_dp_eval_step(m, mesh)
    out = ev(state, shard_batch(jnp.asarray(x), mesh), jnp.float32(0.0), key)
    assert np.isfinite(float(out["loss"]))


def test_dp_pmean_is_mean_of_shard_grads(key):
    """pmean-of-shard-grads must equal the arithmetic mean of the
    per-shard gradients of the SAME compiled program.

    (Comparing against eagerly-computed per-shard grads is numerically
    ill-posed: XLA compiles the shard_map body differently — e.g. oneDNN
    fusions on CPU — and BatchNorm with a 2-sample batch amplifies those
    last-ulp forward differences into visible gradient differences. So
    the exactness check is internal consistency; cross-compilation
    agreement is covered loosely by the loss values below.)"""
    from vae_song_tpu.train.steps import make_grads_fn
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    m = VanillaVAE.for_dataset("pinwheel", encoder_type="mlp", decoder_type="mlp", beta=0.0)
    x = np.random.default_rng(3).normal(size=(16, 2)).astype(np.float32)
    params, batch_stats = init_model(m, x[:4], seed=0)
    grads_fn = make_grads_fn(m)

    def per_device(p, xs):
        rng = jax.random.fold_in(key, jax.lax.axis_index("data"))
        g, aux = grads_fn(p, batch_stats, xs, jnp.float32(0.0), rng)
        gm = jax.lax.pmean(g, "data")
        # per-shard grads (leading axis) + reduced grads + per-shard loss
        return jax.tree.map(lambda v: v[None], g), gm, aux[0].reshape(1)

    sharded = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P("data"), P(), P("data")),
            check_vma=False,
        )
    )
    per_shard, reduced, losses = sharded(params, jnp.asarray(x))
    mean_of_shards = jax.tree.map(lambda v: v.mean(axis=0), per_shard)
    for a, b in zip(jax.tree.leaves(mean_of_shards), jax.tree.leaves(reduced)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    # loose cross-compilation sanity: shard losses match eager evaluation
    eager_losses = []
    for i in range(8):
        _, aux = grads_fn(
            params, batch_stats, jnp.asarray(x[i * 2 : (i + 1) * 2]),
            jnp.float32(0.0), jax.random.fold_in(key, i),
        )
        eager_losses.append(float(aux[0]))
    np.testing.assert_allclose(
        np.asarray(losses).ravel(), np.asarray(eager_losses), rtol=5e-3
    )


def test_multihost_init_composes_with_mesh():
    """`init_multihost` (jax.distributed, single-process coordinator — the
    most a one-host box can exercise) composes with make_mesh + a sharded
    computation. Runs in a subprocess because distributed state is global."""
    import os
    import subprocess
    import sys

    import socket

    with socket.socket() as s:  # pick a free port; a fixed one can collide
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    code = (
        'import jax\n'
        'jax.config.update("jax_platforms", "cpu")\n'
        'from vae_song_tpu.parallel import init_multihost, make_mesh\n'
        f'pid, nproc = init_multihost("localhost:{port}", 1, 0)\n'
        'assert (pid, nproc) == (0, 1), (pid, nproc)\n'
        'import jax.numpy as jnp\n'
        'from jax.sharding import NamedSharding, PartitionSpec as P\n'
        'mesh = make_mesh()\n'
        'assert mesh.shape["data"] == 8, mesh.shape\n'
        'x = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("data")))\n'
        'assert float(jax.jit(lambda v: v.sum())(x)) == 28.0\n'
        'print("MULTIHOST-OK")\n'
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert "MULTIHOST-OK" in out.stdout, out.stdout + out.stderr
