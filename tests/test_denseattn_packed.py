"""Lane-packed dense attention ([B, N, H*D] layout, two heads per
128-lane block) vs XLA attention, interpret mode.

The packed kernel (ops/denseattn.py:dense_attention_packed) is the
transpose-free variant: it must match the head-reshaped XLA reference
to float tolerance for the forward and all three input cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vae_song_tpu.ops.attention import _xla_attention
from vae_song_tpu.ops.denseattn import dense_attention_packed, packed_ok

B, N, H, D = 2, 256, 4, 64
SCALE = 1.0 / np.sqrt(D)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    return mk(), mk(), mk()


def _xla_flat(q, k, v):
    """XLA reference on the packed layout: reshape to heads, attend,
    reshape back."""
    heads = lambda a: a.reshape(B, N, H, D)
    out = _xla_attention(heads(q), heads(k), heads(v), SCALE,
                         compute_dtype=jnp.float32)
    return out.reshape(B, N, H * D)


def test_gate():
    assert packed_ok(2048, 2048, 4, 64)
    assert not packed_ok(2048, 2048, 3, 64)   # odd head count
    assert not packed_ok(2048, 2048, 4, 128)  # only 64-wide heads pack
    assert not packed_ok(2048, 1, 4, 64)      # cross-attention shapes


def test_forward_matches_xla_f32():
    q, k, v = _inputs()
    want = _xla_flat(q, k, v)
    got = dense_attention_packed(q, k, v, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_backward_matches_xla_f32():
    q, k, v = _inputs(1)
    co = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, N, H * D)).astype(np.float32)
    )

    def loss_packed(q, k, v):
        return (dense_attention_packed(q, k, v, SCALE, interpret=True) * co).sum()

    def loss_xla(q, k, v):
        return (_xla_flat(q, k, v) * co).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close_to_f32():
    q, k, v = _inputs(3)
    want = _xla_flat(q, k, v)
    got = dense_attention_packed(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), SCALE, interpret=True,
    ).astype(jnp.float32)
    assert float(jnp.abs(got - want).max()) < 5e-2


def test_matches_unpacked_dense_kernel():
    """Packed and base kernels share the math; their f32 interpret-mode
    outputs must agree to float roundoff."""
    from vae_song_tpu.ops.denseattn import dense_attention

    q, k, v = _inputs(4)
    heads = lambda a: a.reshape(B, N, H, D)
    want = dense_attention(heads(q), heads(k), heads(v), SCALE,
                           interpret=True).reshape(B, N, H * D)
    got = dense_attention_packed(q, k, v, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_gspmd_partitioning_matches_unsharded():
    """custom_partitioning rule: batch on 'data' plus the feature axis
    (head pairs) on 'model' — the TP layout — must reproduce the
    unsharded result and cotangents."""
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = _inputs(5)
    want = _xla_flat(q, k, v)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    # model axis is 4-wide but F=256 only packs 2 head pairs: the
    # partition rule must DROP the misaligned feature sharding (64
    # lanes/shard) and still be correct
    for spec in (P("data", None, None), P("data", None, "model")):
        sh = NamedSharding(mesh, spec)
        f = jax.jit(
            lambda q, k, v: dense_attention_packed(q, k, v, SCALE, interpret=True),
            in_shardings=(sh, sh, sh), out_shardings=sh,
        )
        got = f(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    # 2-way feature sharding = one whole 128-lane head pair per shard:
    # kept by the rule, grads must still match
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    sh2 = NamedSharding(mesh2, P(None, None, "model"))
    grad = jax.jit(
        jax.grad(lambda q: dense_attention_packed(q, k, v, SCALE, interpret=True).sum()),
        in_shardings=(sh2,),
    )(q)
    gw = jax.grad(lambda q: _xla_flat(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(gw),
                               atol=5e-5, rtol=5e-5)


def test_shard_map_dp_context():
    """The DP training path wraps compute in shard_map(check_vma=False)
    (parallel/mesh.py); the packed kernel must run per-shard there."""
    import pytest
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = _inputs(6)
    tile = lambda a: jnp.tile(a, (4, 1, 1))
    want = _xla_flat(q, k, v)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sm = jax.shard_map(
        lambda q, k, v: dense_attention_packed(q, k, v, SCALE, interpret=True),
        mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P("data"),
        check_vma=False,
    )
    got = jax.jit(sm)(tile(q), tile(k), tile(v))
    np.testing.assert_allclose(np.asarray(got[:B]), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_packed_default_gate(monkeypatch):
    """_packed_attn_ok: default-on for eligible shapes on TPU; opt-out
    via VST_DENSE_ATTN_PACKED=0 (falls back to the base BHND kernel)
    or VST_DISABLE_DENSE_ATTN=1 (disables both dense kernels)."""
    from vae_song_tpu.ops import attention as attn

    assert attn._packed_attn_ok(2048, 2048, 4, 64) is False  # CPU backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert attn._packed_attn_ok(2048, 2048, 4, 64) is True
    assert attn._packed_attn_ok(2048, 2048, 3, 64) is False  # odd heads
    assert attn._packed_attn_ok(2048, 2048, 4, 128) is False

    monkeypatch.setenv("VST_DENSE_ATTN_PACKED", "0")
    assert attn._packed_attn_ok(2048, 2048, 4, 64) is False
    monkeypatch.delenv("VST_DENSE_ATTN_PACKED")
    monkeypatch.setenv("VST_DISABLE_DENSE_ATTN", "1")
    assert attn._packed_attn_ok(2048, 2048, 4, 64) is False


def test_multiblock_backward_accumulation(monkeypatch):
    """On-chip shapes (N=2048) split the backward into N/BWD_BLOCK_Q
    row blocks whose dK/dV accumulate in VMEM scratch across grid
    steps; the small shapes above fall back to nblocks=1, so force
    tiny blocks to exercise the r>0 accumulate and last-block emit
    paths in interpret mode. The forward's FWD_BLOCK_Q grid is covered
    the same way."""
    from vae_song_tpu.ops import denseattn

    monkeypatch.setattr(denseattn, "FWD_BLOCK_Q", 64)
    monkeypatch.setattr(denseattn, "BWD_BLOCK_Q", 64)   # N=256 -> 4 blocks

    q, k, v = _inputs(7)
    co = jnp.asarray(
        np.random.default_rng(8).normal(size=(B, N, H * D)).astype(np.float32)
    )
    want = _xla_flat(q, k, v)
    got = dense_attention_packed(q, k, v, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    gp = jax.grad(
        lambda q, k, v: (dense_attention_packed(q, k, v, SCALE, interpret=True) * co).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: (_xla_flat(q, k, v) * co).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch (multi-block)",
        )
