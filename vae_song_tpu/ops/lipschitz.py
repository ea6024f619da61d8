"""Empirical local-Lipschitz estimation (utils.py:532-567), vmapped.

Given a function f and samples X, draw random index pairs, compute
||f(x1)-f(x2)|| / ||x1-x2||, and report quantiles:
  inv_lips = 1 / quantile(ratios, q)
  lips     = quantile(ratios, 1-q)
  bi_lips  = max(inv_lips, lips)

The whole pair batch is evaluated in one jitted vmap (the reference
loops are avoided); for LIDVAE's gradient-based decode no special
handling is needed — `jax.grad` inside f works under jit.
"""

import jax
import jax.numpy as jnp


def estimate_local_lipschitz(
    func,
    X,
    key,
    num_pairs: int = 2000,
    metric: int = 2,
    quantile: float = 0.05,
    eps: float = 1e-3,
):
    """Returns (inverse_lipschitz, lipschitz, bi_lipschitz) floats."""
    n = X.shape[0]
    if n < 2:
        return 0.0, 0.0, 0.0
    k1, k2 = jax.random.split(key)
    idx1 = jax.random.randint(k1, (num_pairs,), 0, n)
    idx2 = jax.random.randint(k2, (num_pairs,), 0, n)
    x1 = X[idx1]
    x2 = X[idx2]
    y1 = func(x1)
    y2 = func(x2)
    diff_y = jnp.linalg.norm(
        (y1 - y2).reshape(num_pairs, -1), ord=metric, axis=1
    ).clip(min=eps)
    diff_x = jnp.linalg.norm(
        (x1 - x2).reshape(num_pairs, -1), ord=metric, axis=1
    ).clip(min=eps)
    ratio = diff_y / diff_x
    a = jnp.quantile(ratio, quantile).clip(min=eps)
    b = jnp.quantile(ratio, 1.0 - quantile)
    inv_a = 1.0 / a
    bi = jnp.maximum(inv_a, b)
    return float(inv_a), float(b), float(bi)
