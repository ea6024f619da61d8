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
