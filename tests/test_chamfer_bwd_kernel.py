"""The masked-matmul chamfer backward kernel (ops/chamfer.py:
_chamfer_bwd_kernel) vs the gather/scatter-add XLA formulation, in
Pallas interpret mode. Multi-tile grids exercise the cross-term
accumulation across pred tiles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_song_tpu.ops.chamfer import (
    _chamfer_bwd_pallas,
    _chamfer_bwd_xla,
    chamfer_distance,
)


def _mins_args(pred, gt):
    d2 = ((pred[:, :, None, :] - gt[:, None, :, :]) ** 2).sum(-1)
    return (d2.argmin(axis=2).astype(np.int32),
            d2.argmin(axis=1).astype(np.int32))


@pytest.mark.parametrize("np_,ng,tile", [(16, 16, 16), (32, 16, 8)])
def test_bwd_kernel_matches_xla_scatter(np_, ng, tile):
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(8, np_, 3)).astype(np.float32)
    gt = rng.normal(size=(8, ng, 3)).astype(np.float32)
    argp, argg = _mins_args(pred, gt)

    dp, dg = _chamfer_bwd_pallas(
        jnp.asarray(pred), jnp.asarray(gt),
        jnp.asarray(argp), jnp.asarray(argg), tile, interpret=True,
    )
    want_dp, want_dg = _chamfer_bwd_xla(
        (jnp.asarray(pred), jnp.asarray(gt),
         jnp.asarray(argp), jnp.asarray(argg)), 1.0,
    )
    np.testing.assert_allclose(np.asarray(dp), np.asarray(want_dp),
                               rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(want_dg),
                               rtol=1e-5, atol=2e-6)


def test_bwd_kernel_matches_autodiff_of_xla_chamfer():
    """End-to-end: kernel gradients == jax.grad of the differentiable
    XLA chamfer (nearest-neighbour assignment fixed, the standard
    chamfer subgradient)."""
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(8, 16, 3)).astype(np.float32)
    gt = rng.normal(size=(8, 16, 3)).astype(np.float32)
    argp, argg = _mins_args(pred, gt)

    dp, dg = _chamfer_bwd_pallas(
        jnp.asarray(pred), jnp.asarray(gt),
        jnp.asarray(argp), jnp.asarray(argg), 16, interpret=True,
    )
    want_dp, want_dg = jax.grad(chamfer_distance, argnums=(0, 1))(
        jnp.asarray(pred), jnp.asarray(gt)
    )
    np.testing.assert_allclose(np.asarray(dp), np.asarray(want_dp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(want_dg),
                               rtol=1e-5, atol=1e-6)


def test_bwd_kernel_duplicate_targets():
    """Many points collapsing onto one nearest neighbour (count > 1 in
    the cross terms) — the case a scatter-ADD handles by accumulation
    and the kernel by mask counts."""
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(8, 16, 3)).astype(np.float32)
    # all pred points huddle near gt[0]: argp is constant 0 for most
    pred = 0.01 * rng.normal(size=(8, 16, 3)).astype(np.float32) + gt[:, :1]
    argp, argg = _mins_args(pred, gt)

    dp, dg = _chamfer_bwd_pallas(
        jnp.asarray(pred), jnp.asarray(gt),
        jnp.asarray(argp), jnp.asarray(argg), 8, interpret=True,
    )
    want_dp, want_dg = _chamfer_bwd_xla(
        (jnp.asarray(pred), jnp.asarray(gt),
         jnp.asarray(argp), jnp.asarray(argg)), 1.0,
    )
    np.testing.assert_allclose(np.asarray(dp), np.asarray(want_dp),
                               rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(want_dg),
                               rtol=1e-5, atol=2e-6)
