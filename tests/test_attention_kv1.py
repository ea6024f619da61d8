"""The kv-length-1 cross-attention shortcut (ops/attention.py): softmax
over a single key is identically 1.0, so output == broadcast value
projection and q/k carry zero gradient. Verify against the explicit
materialized-softmax computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.ops.attention import MultiHeadAttention
from vae_song_tpu.train.loop import init_model


def _explicit_reference(params, q_in, kv_in, h, d):
    """Projections + softmax([B,H,N,1]) + weighted sum + out proj."""

    def dense(p, x):
        return x @ p["kernel"] + p["bias"]

    b, n = q_in.shape[0], q_in.shape[1]
    q = dense(params["query"], q_in).reshape(b, n, h, d)
    k = dense(params["key"], kv_in).reshape(b, 1, h, d)
    v = dense(params["value"], kv_in).reshape(b, 1, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, h * d)
    return dense(params["out"], out)


def test_kv1_matches_explicit_softmax_and_grads():
    h, d_model = 2, 16
    mha = MultiHeadAttention(num_heads=h, d_model=d_model)
    rng = np.random.default_rng(0)
    q_in = jnp.asarray(rng.normal(size=(3, 8, d_model)), jnp.float32)
    kv_in = jnp.asarray(rng.normal(size=(3, 1, d_model)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), q_in, kv_in)["params"]

    got = mha.apply({"params": params}, q_in, kv_in)
    want = _explicit_reference(params, q_in, kv_in, h, d_model // h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # gradients: q/k projection params get ZERO grad (constant softmax),
    # v/out get the same grads as the explicit computation
    def loss_short(p):
        return (mha.apply({"params": p}, q_in, kv_in) ** 2).sum()

    def loss_ref(p):
        return (_explicit_reference(p, q_in, kv_in, h, d_model // h) ** 2).sum()

    g_short = jax.grad(loss_short)(params)
    g_ref = jax.grad(loss_ref)(params)
    for name in ("query", "key"):
        for leaf in jax.tree.leaves(g_short[name]):
            np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-6)
        # the explicit path's q/k grads are zero too — same math
        for leaf in jax.tree.leaves(g_ref[name]):
            np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-5)
    for name in ("value", "out"):
        for a, b in zip(jax.tree.leaves(g_short[name]), jax.tree.leaves(g_ref[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_kv1_param_tree_unchanged():
    """The shortcut must register the same param tree (log.txt param
    counts are a parity artifact)."""
    mha = MultiHeadAttention(num_heads=2, d_model=16)
    q_in = jnp.zeros((2, 8, 16))
    p1 = mha.init(jax.random.PRNGKey(0), q_in, jnp.zeros((2, 1, 16)))["params"]
    p2 = mha.init(jax.random.PRNGKey(0), q_in, jnp.zeros((2, 8, 16)))["params"]
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    assert [x.shape for x in jax.tree.leaves(p1)] == \
           [x.shape for x in jax.tree.leaves(p2)]
