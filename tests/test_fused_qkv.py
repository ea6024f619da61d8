"""Fused self-attention in-projection (ops/attention.py:_fused_qkv_on):
one [d, 3d] matmul vs three Dense calls must be interchangeable — same
param tree, same init bits, same outputs and gradients — because the
fused path only concatenates the same three kernels at apply time
(torch's nn.MultiheadAttention in_proj_weight layout, model.py:950)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.ops.attention import MultiHeadAttention


@pytest.fixture
def mha_and_x():
    mha = MultiHeadAttention(num_heads=2, d_model=16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 8, 16)), jnp.float32
    )
    return mha, x


def test_fused_init_bits_and_tree_match_unfused(mha_and_x, monkeypatch):
    mha, x = mha_and_x
    monkeypatch.setenv("VST_FUSED_QKV", "0")
    p0 = mha.init(jax.random.PRNGKey(0), x, x)
    monkeypatch.setenv("VST_FUSED_QKV", "1")
    p1 = mha.init(jax.random.PRNGKey(0), x, x)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_outputs_and_grads_match_unfused(mha_and_x, monkeypatch):
    mha, x = mha_and_x
    params = mha.init(jax.random.PRNGKey(0), x, x)

    def loss(p):
        return (mha.apply(p, x, x) ** 2).sum()

    monkeypatch.setenv("VST_FUSED_QKV", "0")
    y0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("VST_FUSED_QKV", "1")
    y1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(y0), float(y1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_bf16_compute_path(mha_and_x, monkeypatch):
    """compute_dtype=bf16 (the shipped set configs): the fused matmul
    casts input/kernels/bias exactly like flax Dense(dtype=bf16)."""
    _, x = mha_and_x
    mha = MultiHeadAttention(num_heads=2, d_model=16,
                             compute_dtype=jnp.bfloat16)
    params = mha.init(jax.random.PRNGKey(0), x, x)
    monkeypatch.setenv("VST_FUSED_QKV", "0")
    y0 = mha.apply(params, x, x)
    monkeypatch.setenv("VST_FUSED_QKV", "1")
    y1 = mha.apply(params, x, x)
    np.testing.assert_allclose(
        np.asarray(y0, np.float32), np.asarray(y1, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 stream; CPU matmul blocking may differ
    )


def test_cross_attention_routes_unfused(monkeypatch):
    """Different q/kv arrays (cross-attention) must take the three-Dense
    path regardless of the flag — the fusion keys on object identity."""
    monkeypatch.setenv("VST_FUSED_QKV", "1")
    mha = MultiHeadAttention(num_heads=2, d_model=16)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), q, kv)
    out = mha.apply(params, q, kv)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
