"""Lipschitz / KL field analysis (lipschitz.py:48-222), TPU-first.

The reference loops over K*K grid cells, running encode/decode per cell
on whatever number of points landed there (dynamic shapes, hundreds of
tiny kernel launches). Here every cell is padded/sampled to a fixed
size host-side and the whole field is computed in a handful of jitted,
batched calls:

  * per-cell KL over X-space: one encode of the full test set + one
    segment-mean,
  * per-cell decoder Lipschitz: fixed `num_pairs` index pairs per cell
    gathered into a single [cells * pairs * 2, zdim] decode batch,
  * Z-space grid: a dense [K_z^2, nsamples, 2] tensor of jittered cell
    centers, decoded and re-encoded in one batch.

LIDVAE needs no special casing: its decode contains `jax.grad`
internally and jits like any other function.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vae_song_tpu.ops import losses

DEFAULT_EMPTY_CELL_FILL_VALUE = -5.0  # lipschitz.py:19


def _quantile_ratios(y1, y2, x1, x2, quantile=0.05, eps=1e-3):
    """(inv_lips, lips, bi_lips) from pair ratios, per group.

    y*, x*: [G, P, D...] — G groups, P pairs.
    """
    g, p = x1.shape[0], x1.shape[1]
    dy = jnp.linalg.norm((y1 - y2).reshape(g, p, -1), axis=-1).clip(min=eps)
    dx = jnp.linalg.norm((x1 - x2).reshape(g, p, -1), axis=-1).clip(min=eps)
    ratio = dy / dx
    a = jnp.quantile(ratio, quantile, axis=1).clip(min=eps)
    b = jnp.quantile(ratio, 1.0 - quantile, axis=1)
    inv_a = 1.0 / a
    return inv_a, b, jnp.maximum(inv_a, b)


def per_cell_kl(mu, log_var, labels, num_cells, fill=DEFAULT_EMPTY_CELL_FILL_VALUE):
    """Mean per-sample KL per cell (lipschitz.py:61-63). One segment op."""
    kl = losses.kl_per_sample(mu, log_var)
    sums = jax.ops.segment_sum(kl, labels, num_segments=num_cells)
    counts = jax.ops.segment_sum(jnp.ones_like(kl), labels, num_segments=num_cells)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), fill)
    return means, counts


def cellwise_decoder_lipschitz(
    decode_fn,
    z_by_cell,
    valid,
    key,
    num_pairs: int = 2000,
    quantile: float = 0.05,
    eps: float = 1e-3,
    fill: float = DEFAULT_EMPTY_CELL_FILL_VALUE,
):
    """Per-cell decoder Lipschitz stats in ONE decode batch.

    z_by_cell: [C, S, zdim] fixed-size z samples per cell (pre-gathered
    host-side, garbage rows allowed for invalid cells).
    valid:     [C] bool — cells with >= 2 original samples.
    Returns (inv_lips, lips, bi_lips) arrays [C] with `fill` where invalid.
    """
    c, s, zdim = z_by_cell.shape
    k1, k2 = jax.random.split(key)
    idx1 = jax.random.randint(k1, (c, num_pairs), 0, s)
    idx2 = jax.random.randint(k2, (c, num_pairs), 0, s)
    z1 = jnp.take_along_axis(z_by_cell, idx1[..., None], axis=1)  # [C, P, zdim]
    z2 = jnp.take_along_axis(z_by_cell, idx2[..., None], axis=1)
    y1 = decode_fn(z1.reshape(c * num_pairs, zdim)).reshape(c, num_pairs, -1)
    y2 = decode_fn(z2.reshape(c * num_pairs, zdim)).reshape(c, num_pairs, -1)
    inv_a, b, bi = _quantile_ratios(y1, y2, z1, z2, quantile, eps)
    inv_a = jnp.where(valid, inv_a, fill)
    b = jnp.where(valid, b, fill)
    bi = jnp.where(valid, bi, fill)
    return inv_a, b, bi


def gather_cell_samples(mu, log_var, labels, num_cells, key,
                        samples_per_cell: int = 256):
    """Host-side prep: for each cell, draw `samples_per_cell` member
    indices (with replacement) and reparameterize each once
    -> [C, S, zdim].

    Statistically equivalent coverage to lipschitz.py:68's
    members x 10-reparam draw, with a fixed-size batched layout
    (cells with fewer members up-sample with replacement).
    """
    mu = np.asarray(mu)
    log_var = np.asarray(log_var)
    labels = np.asarray(labels)
    c = num_cells
    zdim = mu.shape[1]
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    member_idx = np.zeros((c, samples_per_cell), np.int32)
    valid = np.zeros(c, bool)
    counts = np.zeros(c, np.int64)
    for cell in range(c):
        members = np.nonzero(labels == cell)[0]
        counts[cell] = len(members)
        if len(members) >= 2:
            valid[cell] = True
            member_idx[cell] = rng.choice(members, samples_per_cell, replace=True)

    mu_s = mu[member_idx]          # [C, S, zdim]
    std_s = np.exp(0.5 * log_var[member_idx])
    eps = rng.standard_normal((c, samples_per_cell, zdim)).astype(np.float32)
    z = (mu_s + eps * std_s).astype(np.float32)
    return jnp.asarray(z), jnp.asarray(valid), counts


def z_grid_samples(K_z, z_min, z_max, latent_dim, key, nsamples_per_cell=100,
                   jitter_std=0.1):
    """[K_z^2, n, latent_dim] jittered Z-grid samples (lipschitz.py:100-115).
    Cell order matches the reference: index = y_idx * K_z + x_idx."""
    zx = np.linspace(z_min, z_max, K_z)
    zy = np.linspace(z_min, z_max, K_z)
    centers = np.array([[zx[xi], zy[yi]] for yi in range(K_z) for xi in range(K_z)],
                       np.float32)
    if latent_dim != 2:
        raise ValueError(
            f"Skipping Z-space grid evaluation: Model's actual latent "
            f"dimension is {latent_dim}D, not 2D."
        )
    eps = jax.random.normal(key, (K_z * K_z, nsamples_per_cell, latent_dim))
    return jnp.asarray(centers)[:, None, :] + jitter_std * eps


def z_grid_kl(decode_fn, encode_fn, z_samples):
    """Decode each Z-grid sample, re-encode, mean KL(re-enc || N(0,I))
    per cell (lipschitz.py:117-133). One batched decode+encode."""
    c, n, zdim = z_samples.shape
    x_rec = decode_fn(z_samples.reshape(c * n, zdim))
    mu_re, log_var_re = encode_fn(x_rec)
    kl = losses.kl_per_sample(mu_re, log_var_re)
    return kl.reshape(c, n).mean(axis=1)


def data_based_z_samples(mu, log_var, key, num_samples=5000):
    """z samples from the encoded data distribution + the (mu, log_var)
    subset used (lipschitz.py:157-222). When the dataset is smaller than
    num_samples, extra reparameterized draws are taken per point."""
    n, zdim = mu.shape
    if n < num_samples:
        ns = num_samples // n + 1
        eps = jax.random.normal(key, (n, ns, zdim))
        z = (mu[:, None, :] + eps * jnp.exp(0.5 * log_var)[:, None, :])
        return z.reshape(-1, zdim)[:num_samples], mu, log_var
    k1, k2 = jax.random.split(key)
    idx = jax.random.permutation(k1, n)[:num_samples]
    mu_s, lv_s = mu[idx], log_var[idx]
    eps = jax.random.normal(k2, mu_s.shape)
    return mu_s + eps * jnp.exp(0.5 * lv_s), mu_s, lv_s


def data_based_kl(mu_subset, log_var_subset):
    """Mean per-sample KL over the data-based subset (lipschitz.py:219-220)."""
    kl = losses.kl_per_sample(mu_subset, log_var_subset)
    return float(kl.mean())


def compute_local_reg(loss_fn, X, labels, K):
    """Per-grid-cell mean of the VAE regularization (KL*beta) term
    (utils.py:509-530). loss_fn(x_cell) -> scalar reg term for a batch."""
    regs = []
    X = np.asarray(X)
    labels = np.asarray(labels)
    for cell in range(K * K):
        mask = labels == cell
        if mask.sum() == 0:
            regs.append(0.0)
            continue
        x_cell = X[mask]
        regs.append(float(loss_fn(jnp.asarray(x_cell))) / x_cell.shape[0])
    return np.array(regs)


def data_based_lipschitz(decode_fn, z_samples, key, num_pairs=5000,
                         quantile=0.05, eps=1e-3):
    """Global decoder Lipschitz from data-distribution z samples."""
    n = z_samples.shape[0]
    k1, k2 = jax.random.split(key)
    i1 = jax.random.randint(k1, (num_pairs,), 0, n)
    i2 = jax.random.randint(k2, (num_pairs,), 0, n)
    z1, z2 = z_samples[i1], z_samples[i2]
    y1 = decode_fn(z1)
    y2 = decode_fn(z2)
    inv_a, b, bi = _quantile_ratios(y1[None], y2[None], z1[None], z2[None],
                                    quantile, eps)
    return float(inv_a[0]), float(b[0]), float(bi[0])
