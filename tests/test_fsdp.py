"""FSDP / ZeRO-3 sharding (parallel/fsdp.py): spec rule, exact
step-level gradient parity vs the single-device step, and the
trainer-path integration (`fsdp: true`) for a non-set model family —
the strategy is structural on array shapes, so it must cover the whole
zoo, not just the set transformers."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vae_song_tpu.models import LRVAE, VanillaVAE
from vae_song_tpu.parallel.fsdp import (
    fsdp_param_specs,
    make_fsdp_mesh,
    make_fsdp_train_step,
    shard_state,
    sharded_fraction,
)
from vae_song_tpu.train.loop import init_model, train_and_test
from vae_song_tpu.train.state import TrainState
from vae_song_tpu.train.steps import make_train_step


def test_leaf_spec_rule():
    params = {
        "big": jnp.zeros((784, 128)),     # both axes % 8 == 0 -> largest
        "tall": jnp.zeros((17, 128 * 200)),  # only the last axis divides
        "bias": jnp.zeros((128,)),        # too small -> replicated
        "odd": jnp.zeros((999, 333)),     # nothing divides 8 -> replicated
    }
    specs = fsdp_param_specs(params, n_shards=8)
    assert specs["big"] == P("data", None)   # largest divisible axis: 784
    assert specs["tall"] == P(None, "data")  # only the last axis divides
    assert specs["bias"] == P()
    assert specs["odd"] == P()


def test_leaf_spec_prefers_largest_axis():
    specs = fsdp_param_specs({"k": jnp.zeros((784, 128))}, n_shards=8,
                             min_shard_elems=0)
    assert specs["k"] == P("data", None)  # 784 is the largest divisible


def test_fsdp_step_matches_single_device():
    """sgd(1.0): params0 - params1 IS the gradient, so one FSDP step
    equaling one single-device step proves the sharded backward (incl.
    LRVAE's staged vjp) reduces to the exact global gradient."""
    model = LRVAE.for_dataset("pinwheel", hidden_channels=(8, 8),
                              encoder_type="mlp", decoder_type="mlp",
                              beta=0.01, alpha=0.01)
    x = np.random.default_rng(0).normal(size=(16, 2)).astype(np.float32)
    params, batch_stats = init_model(model, x, seed=0)
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(1)

    mesh = make_fsdp_mesh(8)
    state = shard_state(
        TrainState.create(params, batch_stats, tx), mesh, min_shard_elems=0
    )

    # deep-copy the reference state: the donating ref_step would
    # otherwise delete buffers the CPU backend ALIASED into the FSDP
    # state's replicated shards (device_put is zero-copy per shard)
    copy = lambda t: jax.tree.map(lambda a: jnp.array(a), t)
    ref_state = TrainState.create(copy(params), copy(batch_stats), tx)
    ref_step = make_train_step(model, tx)
    ref_new, ref_m = ref_step(ref_state, jnp.asarray(x), 0.5, rng)

    step = make_fsdp_train_step(model, tx, mesh, state, min_shard_elems=0)
    new, m = step(state, jnp.asarray(x), jnp.float32(0.5), rng)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_new.params),
                    jax.tree.leaves(new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fsdp_state_is_actually_sharded():
    model = VanillaVAE.for_dataset(
        "mnist", hidden_channels=(128,), encoder_type="mlp",
        decoder_type="mlp", beta=0.01,
    )
    x = np.zeros((16, 28, 28, 1), np.float32)
    params, batch_stats = init_model(model, x, seed=0)
    mesh = make_fsdp_mesh(8)
    state = shard_state(
        TrainState.create(params, batch_stats, optax.adam(1e-3)), mesh
    )
    # the 784x128-ish kernels must exceed the default element threshold
    assert sharded_fraction(state, mesh) > 0.5
    big = [p for p in jax.tree.leaves(state.params) if p.size >= 2 ** 14]
    assert big
    for p in big:
        # each device holds 1/8th of the leaf, not a replica
        assert p.addressable_shards[0].data.size == p.size // 8
    # ZeRO part: adam moments shard like the params
    mu_big = [m for m in jax.tree.leaves(state.opt_state)
              if hasattr(m, "size") and m.size >= 2 ** 14]
    assert mu_big
    for m in mu_big:
        assert m.addressable_shards[0].data.size == m.size // 8


def test_fsdp_trainer_path(tmp_path):
    model = VanillaVAE.for_dataset(
        "mnist", hidden_channels=(128,), encoder_type="mlp",
        decoder_type="mlp", beta=0.01,
    )
    state, summary = train_and_test(
        model,
        fsdp=True,
        epochs=2,
        batch_size=64,
        dataset_name="mnist",
        resultname="res_fsdp",
        dataset_params={"fake": True, "seed": 0},
        output_root=str(tmp_path),
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    assert np.isfinite(summary["eval"]["loss"])
    # the trained state kept its FSDP placement through the loop
    big = [p for p in jax.tree.leaves(state.params) if p.size >= 2 ** 14]
    assert big and all(
        p.addressable_shards[0].data.size == p.size // 8 for p in big
    )


def _set_model():
    from vae_song_tpu.models import SetVAE

    return SetVAE(latent_channel=8, num_points=16, d_model=16, num_heads=2,
                  ff_dim=32, beta=0.1, num_encoder_layers=2,
                  num_decoder_layers=1)


def test_fsdp_exclusive_with_other_strategies(tmp_path):
    with pytest.raises(ValueError, match="exclusive"):
        train_and_test(
            _set_model(), fsdp=True, pipeline_parallel=2,
            epochs=1, batch_size=16, dataset_name="shapenet",
            dataset_params={"fake": True, "num_samples": 32,
                            "num_points": 16},
            output_root=str(tmp_path), visualize_artifacts=False,
            progress=False,
        )


def test_merge_tp_fsdp_specs():
    from vae_song_tpu.parallel.fsdp import merge_tp_fsdp_specs

    params = {
        "qkv": jnp.zeros((16, 2, 8)),
        "small": jnp.zeros((4,)),
        "plain": jnp.zeros((32, 32)),
    }
    tp = {"qkv": P(None, "model", None), "small": P(), "plain": P()}
    merged = merge_tp_fsdp_specs(params, tp, n_data=2, min_shard_elems=0)
    # the TP axis is kept; the largest FREE axis gains 'data'
    assert merged["qkv"] == P("data", "model", None)
    assert merged["small"] == P("data")
    assert merged["plain"] == P(None, "data")  # tie -> minor axis
    # threshold: small leaves keep only their TP sharding
    merged = merge_tp_fsdp_specs(params, tp, n_data=2,
                                 min_shard_elems=2 ** 10)
    assert merged["qkv"] == P(None, "model", None)
    assert merged["small"] == P()


def test_tp_fsdp_step_matches_single_device():
    """2-D (data x model) weight sharding: one TPxFSDP step on a 2x2
    mesh equals the single-device step (sgd(1.0) delta trick)."""
    from vae_song_tpu.parallel.fsdp import (
        make_tp_fsdp_train_step, shard_state_tp_fsdp,
    )
    from vae_song_tpu.parallel.mesh import make_mesh

    model = _set_model()
    x = np.random.default_rng(0).normal(size=(8, 16, 3)).astype(np.float32)
    params, batch_stats = init_model(model, x[:2], seed=0)
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(3)

    mesh = make_mesh(n_data=2, n_model=2)
    state = shard_state_tp_fsdp(
        TrainState.create(params, batch_stats, tx), mesh, min_shard_elems=0
    )

    copy = lambda t: jax.tree.map(lambda a: jnp.array(a), t)
    ref_state = TrainState.create(copy(params), copy(batch_stats), tx)
    ref_step = make_train_step(model, tx)
    ref_new, ref_m = ref_step(ref_state, jnp.asarray(x), 0.1, rng)

    step = make_tp_fsdp_train_step(model, tx, mesh, state,
                                   min_shard_elems=0)
    new, m = step(state, jnp.asarray(x), jnp.float32(0.1), rng)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_new.params),
                    jax.tree.leaves(new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tp_fsdp_trainer_path(tmp_path):
    state, summary = train_and_test(
        _set_model(),
        tensor_parallel=2,
        fsdp=True,
        epochs=2,
        batch_size=16,
        dataset_name="shapenet",
        resultname="res_tpfsdp",
        dataset_params={"fake": True, "num_samples": 32, "num_points": 16},
        output_root=str(tmp_path),
        visualize_artifacts=False,
        progress=False,
        seed=0,
    )
    assert np.isfinite(summary["eval"]["loss"])


def test_fsdp_program_contains_zero3_collectives():
    """The compiled FSDP step must actually implement the ZeRO pattern:
    params gathered ON USE (all-gather in the program) and gradients
    reduced across shards (reduce-scatter, which the CPU backend lowers
    as all-reduce) — not silently replicated state."""
    model = VanillaVAE.for_dataset(
        "mnist", hidden_channels=(128,), encoder_type="mlp",
        decoder_type="mlp", beta=0.01,
    )
    x = np.zeros((16, 28, 28, 1), np.float32)
    params, batch_stats = init_model(model, x, seed=0)
    mesh = make_fsdp_mesh(8)
    tx = optax.adam(1e-3)
    state = shard_state(TrainState.create(params, batch_stats, tx), mesh)
    step = make_fsdp_train_step(model, tx, mesh, state)
    txt = step.lower(
        state, jnp.asarray(x), jnp.float32(0.0), jax.random.PRNGKey(0)
    ).compile().as_text()
    assert txt.count("all-gather") > 0
    assert txt.count("reduce-scatter") + txt.count("all-reduce") > 0
