"""Dense (whole-row) Pallas attention vs XLA attention, interpret mode.

The on-chip numbers live in PARITY.md; here we pin numerics: the f32
kernel path must match XLA attention (ops/attention.py:_xla_attention)
to float tolerance for the forward and all three input cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_song_tpu.ops.attention import _xla_attention
from vae_song_tpu.ops.denseattn import MAX_DENSE_SEQ, dense_attention, dense_ok

B, N, H, D = 2, 256, 2, 64
SCALE = 1.0 / np.sqrt(D)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    return mk(), mk(), mk()


def test_forward_matches_xla_f32():
    q, k, v = _inputs()
    want = _xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32)
    got = dense_attention(q, k, v, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_backward_matches_xla_f32():
    q, k, v = _inputs(1)
    co = jnp.asarray(np.random.default_rng(2).normal(size=(B, N, H, D)).astype(np.float32))

    def loss_dense(q, k, v):
        return (dense_attention(q, k, v, SCALE, interpret=True) * co).sum()

    def loss_xla(q, k, v):
        return (_xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32) * co).sum()

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close_to_f32():
    q, k, v = _inputs(3)
    want = _xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32)
    got = dense_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        SCALE, interpret=True,
    ).astype(jnp.float32)
    # bf16 matmuls + bf16 softmax passes: ~1e-2 absolute on unit-scale data
    assert float(jnp.abs(got - want).max()) < 5e-2


def test_gspmd_partitioning_matches_unsharded():
    """The kernel's custom_partitioning rule: batch on 'data', heads on
    'model' (the TP layout from parallel/tp.py) must reproduce the
    unsharded result and cotangents exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = _inputs(4)
    want = _xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    sh = NamedSharding(mesh, P("data", None, None, None))
    # heads dim (H=2) can only shard 2-ways; shard batch over 'data'
    f = jax.jit(
        lambda q, k, v: dense_attention(q, k, v, SCALE, interpret=True),
        in_shardings=(sh, sh, sh), out_shardings=sh,
    )
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    grad = jax.jit(
        jax.grad(lambda q: dense_attention(q, k, v, SCALE, interpret=True).sum()),
        in_shardings=(sh,),
    )(q)
    gw = jax.grad(lambda q: _xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32).sum())(q)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(gw), atol=5e-5, rtol=5e-5)


def test_shard_map_dp_context():
    """The DP training path wraps compute in shard_map(check_vma=False)
    (parallel/mesh.py); the kernel must run per-shard there."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = _inputs(5)
    qb = jnp.tile(q, (4, 1, 1, 1))
    kb = jnp.tile(k, (4, 1, 1, 1))
    vb = jnp.tile(v, (4, 1, 1, 1))
    want = _xla_attention(q, k, v, SCALE, compute_dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sm = jax.shard_map(
        lambda q, k, v: dense_attention(q, k, v, SCALE, interpret=True),
        mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P("data"),
        check_vma=False,
    )
    got = jax.jit(sm)(qb, kb, vb)
    np.testing.assert_allclose(
        np.asarray(got[:B]), np.asarray(want), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize(
    "n_q,n_kv,d,ok",
    [
        (2048, 2048, 64, True),
        (256, 256, 64, True),
        (2048, 1024, 64, False),   # cross lengths unequal
        (MAX_DENSE_SEQ * 2,) * 2 + (64, False),  # too long for VMEM
        (320, 320, 64, False),     # not 128-aligned
        (256, 256, 32, False),     # head dim not lane-aligned
    ],
)
def test_dense_ok_predicate(n_q, n_kv, d, ok):
    assert dense_ok(n_q, n_kv, d) is ok


def test_dense_default_gate(monkeypatch):
    """_dense_default_ok: on by default for eligible shapes on TPU,
    off on CPU, off under VST_DISABLE_DENSE_ATTN=1."""
    from vae_song_tpu.ops import attention as attn

    # CPU backend (the test environment): never default-on
    assert attn._dense_default_ok(2048, 2048, 64) is False

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert attn._dense_default_ok(2048, 2048, 64) is True
    assert attn._dense_default_ok(2048, 1, 64) is False      # cross-attn
    assert attn._dense_default_ok(4096, 4096, 64) is False   # too long
    monkeypatch.setenv("VST_DISABLE_DENSE_ATTN", "1")
    assert attn._dense_default_ok(2048, 2048, 64) is False   # opt-out


def test_d128_heads_rowsum_fallback():
    """head_dim=128 has no lane-padding slack, so _pv_and_rowsum must
    take the explicit-sum fallback (a ones column would double the
    padded lane count); forward and cotangents still match XLA."""
    d = 128
    rng = np.random.default_rng(9)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, H, d)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    scale = 1.0 / np.sqrt(d)
    co = mk()
    assert dense_ok(N, N, d)

    want = _xla_attention(q, k, v, scale, compute_dtype=jnp.float32)
    got = dense_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    gp = jax.grad(
        lambda q, k, v: (dense_attention(q, k, v, scale, interpret=True) * co).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: (_xla_attention(q, k, v, scale, compute_dtype=jnp.float32) * co).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch (d=128)",
        )
