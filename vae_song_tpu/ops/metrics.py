"""Evaluation metrics: AU, KL, MI, importance-weighted NLL.

Math mirrors the reference's utils.py:40-164 (itself from Wang et al.),
re-expressed as pure jittable JAX functions.
"""

import math

import jax
import jax.numpy as jnp


def reparameterize(key, mu, logvar, nsamples: int = 1):
    """Sample [B, ns, nz] from the posterior Gaussian (utils.py:40-47)."""
    b, nz = mu.shape
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, (b, nsamples, nz), dtype=mu.dtype)
    return mu[:, None, :] + eps * std[:, None, :]


def log_sum_exp(value, axis=None, keepdims=False):
    """Numerically stable logsumexp (utils.py:73-85)."""
    return jax.scipy.special.logsumexp(value, axis=axis, keepdims=keepdims)


def calc_au_per_batch(z, eps: float = 0.01):
    """Fraction of latent dims whose batch variance >= eps (utils.py:49-50)."""
    var = jnp.mean((z - z.mean(axis=0, keepdims=True)) ** 2, axis=0)
    return (var >= eps).astype(jnp.float32).mean()


def calc_au_from_means(means, delta: float = 0.01):
    """Two-pass active units over a full array of posterior means
    [N, nz] (utils.py:52-71). Returns (fraction_active, per-dim var)."""
    mean_mean = means.mean(axis=0, keepdims=True)
    au_var = ((means - mean_mean) ** 2).sum(axis=0) / (means.shape[0] - 1)
    return (au_var >= delta).sum() / means.shape[1], au_var


def kld(mu, log_var):
    """Batch-mean latent-sum KL scalar (utils.py:140-141)."""
    from vae_song_tpu.ops.losses import kl_divergence

    return kl_divergence(mu, log_var)


def calc_mi(key, mu, logvar):
    """MC mutual-information estimate I(x, z) (utils.py:87-107)."""
    x_batch, nz = mu.shape
    neg_entropy = (
        -0.5 * nz * math.log(2 * math.pi) - 0.5 * (1.0 + logvar).sum(-1)
    ).mean()
    z_samples = reparameterize(key, mu, logvar, 1)          # [B, 1, nz]
    mu_e, logvar_e = mu[None], logvar[None]                 # [1, B, nz]
    var = jnp.exp(logvar_e)
    dev = z_samples - mu_e                                  # [B, B, nz]
    log_density = -0.5 * ((dev**2) / var).sum(-1) - 0.5 * (
        nz * math.log(2 * math.pi) + logvar_e.sum(-1)
    )                                                       # [B, B]
    log_qz = log_sum_exp(log_density, axis=1) - math.log(x_batch)
    return neg_entropy - log_qz.mean(-1)


def eval_inference_dist(mu, logvar, z):
    """log q(z|x) for z of shape [B, ns, nz] (utils.py:127-138)."""
    nz = z.shape[2]
    mu_e, logvar_e = mu[:, None], logvar[:, None]
    var = jnp.exp(logvar_e)
    dev = z - mu_e
    return -0.5 * ((dev**2) / var).sum(-1) - 0.5 * (
        nz * math.log(2 * math.pi) + logvar_e.sum(-1)
    )


def nll_iw(key, mu, log_var, loss_rec, nsamples: int = 100):
    """Importance-weighted NLL estimate (utils.py:109-120).

    Keeps the reference's exact formulation, including using the scalar
    reconstruction loss as a stand-in for log p(x|z).
    """
    z = reparameterize(key, mu, log_var, nsamples)          # [B, ns, nz]
    log_prior = (-0.5 * (z**2) - 0.5 * math.log(2 * math.pi)).sum(-1)
    log_comp_ll = log_prior - loss_rec
    log_infer_ll = eval_inference_dist(mu, log_var, z)
    tmp = log_comp_ll - log_infer_ll
    ll_iw = log_sum_exp(tmp) - math.log(nsamples)
    return -ll_iw


def measure_posterior_metrics(key, mu, log_var, loss_rec):
    """AU / KL / MI / NLL / total-var on one batch (utils.py:144-164)."""
    k_mi, k_nll = jax.random.split(key)
    au = calc_au_per_batch(mu)
    kl = kld(mu, log_var)
    mi = calc_mi(k_mi, mu, log_var)
    nll = nll_iw(k_nll, mu, log_var, loss_rec)
    mvar = jnp.exp(log_var).sum()
    return {"au": au, "kl": kl, "mi": mi, "nll": nll, "mean_var": mvar}
