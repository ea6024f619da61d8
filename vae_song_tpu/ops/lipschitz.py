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


def estimate_local_lipschitz(
    func,
    X,
    key,
    num_pairs: int = 2000,
    metric: int = 2,
    quantile: float = 0.05,
    eps: float = 1e-3,
):
    """Returns (inverse_lipschitz, lipschitz, bi_lipschitz) floats.

    Shares the pair-ratio quantile math with the batched cell-field
    analysis (analysis._quantile_ratios) so the two can't drift.
    """
    from vae_song_tpu.analysis import _quantile_ratios

    n = X.shape[0]
    if n < 2:
        return 0.0, 0.0, 0.0
    if metric != 2:
        raise NotImplementedError("only the L2 metric is supported")
    k1, k2 = jax.random.split(key)
    idx1 = jax.random.randint(k1, (num_pairs,), 0, n)
    idx2 = jax.random.randint(k2, (num_pairs,), 0, n)
    x1 = X[idx1]
    x2 = X[idx2]
    y1 = func(x1)
    y2 = func(x2)
    inv_a, b, bi = _quantile_ratios(
        y1[None], y2[None], x1[None], x2[None], quantile, eps
    )
    return float(inv_a[0]), float(b[0]), float(bi[0])
