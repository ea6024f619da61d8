"""Tensor-parallel (GSPMD) set-transformer tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vae_song_tpu.models import SetLRVAE
from vae_song_tpu.parallel.mesh import make_mesh
from vae_song_tpu.parallel.tp import (
    setvae_param_specs,
    shard_state,
    make_tp_dp_train_step,
)
from vae_song_tpu.train.state import TrainState, make_optimizer
from vae_song_tpu.train.loop import init_model


def _tiny_model():
    return SetLRVAE(latent_channel=8, num_points=32, d_model=16, num_heads=2,
                    ff_dim=32, alpha=0.1, beta=0.1)


def test_param_specs_shard_attention_and_ffn(key):
    m = _tiny_model()
    pts = np.random.default_rng(0).normal(size=(4, 32, 3)).astype(np.float32)
    params, _ = init_model(m, pts, seed=0)
    specs = setvae_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    model_sharded = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, spec in flat
        if spec != P()
    ]
    # attention qkv/out and FFN kernels must be model-sharded
    assert any("query" in s for s in model_sharded)
    assert any("out" in s for s in model_sharded)
    assert any("Dense_0" in s for s in model_sharded)
    # embedding / norm params stay replicated
    assert not any("LayerNorm" in s for s in model_sharded)

    # Megatron pairing: FFN up kernel column-sharded, down kernel
    # ROW-sharded (regression: the down path contains both Dense_1 and
    # an inner Dense_0 token)
    flat_all = jax.tree_util.tree_flatten_with_path(specs)[0]
    for path, spec in flat_all:
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        if "Dense_1/" in s and "kernel" in s and "TransformerEncoderLayer" in s:
            assert spec == P("model", None), s
        if "Dense_0/Dense_0/kernel" in s and "TransformerEncoderLayer" in s:
            assert spec == P(None, "model"), s


def test_structural_specs_cover_decoder_ffn():
    """The decoder names its FFN modules ff_up/ff_down (not Dense_*);
    the shape-structural rule must still produce the Megatron pairing —
    the old string-matching rules silently column-sharded ff_down."""
    m = _tiny_model()
    pts = np.random.default_rng(0).normal(size=(4, 32, 3)).astype(np.float32)
    params, _ = init_model(m, pts, seed=0)
    specs = setvae_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]

    def pstr(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    by_path = {pstr(path): spec for path, spec in flat}
    assert by_path["decoder/TransformerDecoderLayer_0/ff_up/Dense_0/kernel"] == P(None, "model")
    assert by_path["decoder/TransformerDecoderLayer_0/ff_up/Dense_0/bias"] == P("model")
    assert by_path["decoder/TransformerDecoderLayer_0/ff_down/Dense_0/kernel"] == P("model", None)
    assert by_path["decoder/TransformerDecoderLayer_0/ff_down/Dense_0/bias"] == P()
    # outside transformer layers nothing is sharded
    assert by_path["encoder/Dense_1/Dense_0/kernel"] == P()

    # exact sharded-leaf census for this fixed tiny model:
    # enc layer = 3 qkv kernels + 3 qkv biases + out kernel + ffn(up k,
    # up b, down k) = 10; dec layer = 2 attn x 7 + 3 ffn = 17
    n_sharded = sum(1 for _p, s in flat if "model" in str(s))
    assert n_sharded == 2 * 10 + 2 * 17, n_sharded


def test_square_ffn_kernels_keep_megatron_pairing():
    """ff_dim == d_model makes FFN kernels square — the shape rule is
    ambiguous there and must fall back to the name tiebreak instead of
    silently replicating the whole FFN."""
    m = SetLRVAE(latent_channel=8, num_points=32, d_model=16, num_heads=2,
                 ff_dim=16, alpha=0.1, beta=0.1)
    pts = np.random.default_rng(0).normal(size=(4, 32, 3)).astype(np.float32)
    params, _ = init_model(m, pts, seed=0)
    specs = setvae_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {
        "/".join(str(getattr(p, "key", p)) for p in path): spec
        for path, spec in flat
    }
    # decoder names: ff_up / ff_down
    assert by_path["decoder/TransformerDecoderLayer_0/ff_up/Dense_0/kernel"] == P(None, "model")
    assert by_path["decoder/TransformerDecoderLayer_0/ff_down/Dense_0/kernel"] == P("model", None)
    # encoder names: wrapper Dense_0 (up) / Dense_1 (down) — the down
    # path contains an inner Dense_0 token, the classic footgun
    assert by_path["encoder/TransformerEncoderLayer_0/Dense_0/Dense_0/kernel"] == P(None, "model")
    assert by_path["encoder/TransformerEncoderLayer_0/Dense_1/Dense_0/kernel"] == P("model", None)


def test_tp_coverage_invariant_raises():
    """A parameter tree whose transformer layer matches no structural
    rule (square non-attention kernel) must fail loudly, not train
    replicated."""
    import pytest
    from vae_song_tpu.parallel.tp import check_tp_coverage

    bad = {
        "TransformerEncoderLayer_0": {
            "mystery": {"kernel": np.zeros((8, 8), np.float32),
                        "bias": np.zeros((8,), np.float32)}
        }
    }
    with pytest.raises(ValueError, match="zero 'model'-sharded"):
        setvae_param_specs(bad)
    # and the checker is callable directly on a spec tree
    ok = setvae_param_specs(
        {"TransformerEncoderLayer_0": {"query": {"kernel": np.zeros((8, 8), np.float32)}}},
        check=False,
    )
    check_tp_coverage(ok)


def test_tp_dp_step_runs(key):
    mesh = make_mesh(n_data=4, n_model=2)
    m = _tiny_model()
    pts = np.random.default_rng(1).normal(size=(8, 32, 3)).astype(np.float32)
    params, bs = init_model(m, pts, seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    state = shard_state(state, mesh)
    step = make_tp_dp_train_step(m, tx, mesh, state)

    x = jax.device_put(
        jnp.asarray(pts),
        jax.sharding.NamedSharding(mesh, P("data")),
    )
    state, metrics = step(state, x, jnp.float32(1.0), key)
    assert np.isfinite(float(metrics["loss"]))
    # second step reuses the compiled program
    state, metrics = step(state, x, jnp.float32(1.0), jax.random.fold_in(key, 1))
    assert np.isfinite(float(metrics["loss"]))
    # the attention kernels really live sharded on the model axis
    enc0 = state.params["encoder"]
    qkv = None
    def find_q(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                r = find_q(v)
                if r is not None:
                    return r
            elif "query" in str(k):
                return v
        return None
    # walk to any query kernel
    leaves = jax.tree_util.tree_flatten_with_path(state.params)[0]

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    q = next(v for path, v in leaves
             if "query" in path_str(path) and "kernel" in path_str(path))
    assert "model" in str(q.sharding.spec)


def test_tp_rejects_flash_attention_when_dense_ineligible(monkeypatch):
    """GSPMD TP cannot partition the tiled flash call; a use_flash model
    whose self-attention shapes don't qualify for the partitionable
    dense kernel (ops/denseattn.py) must fail loudly at construction.
    The gate only applies on the TPU backend (off-TPU the kernels are
    bypassed), so simulate it."""
    import pytest
    import vae_song_tpu.parallel.tp as tp_mod
    from vae_song_tpu.train.state import make_optimizer

    mesh = make_mesh(n_data=4, n_model=2)
    m = SetLRVAE(latent_channel=8, num_points=32, d_model=16, num_heads=2,
                 ff_dim=32, alpha=0.1, beta=0.1, use_flash=True)
    pts = np.random.default_rng(0).normal(size=(8, 32, 3)).astype(np.float32)
    params, bs = init_model(m, pts, seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    # patch AFTER init (a fake-TPU backend during init would mis-route
    # the attention tracing to Pallas kernels the CPU can't lower)
    monkeypatch.setattr(tp_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="use_flash"):
        make_tp_dp_train_step(m, tx, mesh, state)


def test_tp_rejects_flash_when_env_optout_set(monkeypatch):
    """With VST_DISABLE_DENSE_ATTN=1 an otherwise dense-eligible
    use_flash model would route to the unpartitionable tiled flash
    kernel — the TP gate must reject it too (ADVICE r2)."""
    import pytest
    import vae_song_tpu.parallel.tp as tp_mod
    from vae_song_tpu.train.state import make_optimizer

    mesh = make_mesh(n_data=4, n_model=2)
    m = SetLRVAE(latent_channel=8, num_points=128, d_model=128, num_heads=2,
                 ff_dim=32, alpha=0.1, beta=0.1, use_flash=True)
    pts = np.random.default_rng(0).normal(size=(8, 128, 3)).astype(np.float32)
    params, bs = init_model(m, pts, seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    monkeypatch.setattr(tp_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("VST_DISABLE_DENSE_ATTN", "1")
    with pytest.raises(ValueError, match="use_flash"):
        make_tp_dp_train_step(m, tx, mesh, state)


def test_tp_accepts_flash_when_dense_eligible():
    """use_flash + TP is allowed when the self-attention routes to the
    dense kernel, which carries a custom_partitioning rule. (On the CPU
    test backend the kernel itself is bypassed — _flash_ok requires
    TPU — so this exercises construction + a step with XLA attention.)"""
    from vae_song_tpu.train.state import make_optimizer

    mesh = make_mesh(n_data=4, n_model=2)
    m = SetLRVAE(latent_channel=8, num_points=128, d_model=128, num_heads=2,
                 ff_dim=32, alpha=0.1, beta=0.1, use_flash=True)
    pts = np.random.default_rng(0).normal(size=(8, 128, 3)).astype(np.float32)
    params, bs = init_model(m, pts, seed=0)
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, bs, tx)
    step = make_tp_dp_train_step(m, tx, mesh, state)
    with mesh:
        sharded = shard_state(state, mesh)
        new_state, metrics = step(
            sharded, jnp.asarray(pts), jnp.float32(0.1), jax.random.PRNGKey(0)
        )
    assert np.isfinite(float(metrics["loss"]))
