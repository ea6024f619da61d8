"""Loss terms, replicating the reference's reductions exactly.

Reduction conventions (load-bearing for parity — see model.py):
  * recon MSE: ((x - x_hat)**2).mean(axis=0).sum()
      -> mean over batch, SUM over feature axes       (model.py:541-542)
  * log-MSE (Rybkin sigma-VAE): 0.5 * D * (log(2*pi*mse_i + 1e-5) + 1),
      mean over batch, where mse_i is a per-sample mean over all
      feature axes and D = number of features         (model.py:543-548)
  * KL: (-0.5 * (1 + logvar - mu^2 - exp(logvar))).mean(axis=0).sum()
                                                      (model.py:550)
  * latent-recon: ((z_in - z_rec)**2).mean(axis=0).sum()
      with [L, B, D] stacks: mean over L, SUM over B and D
      (scales with batch size — a reference quirk we keep, model.py:603)
"""

import jax.numpy as jnp


def mse_recon(x, recon):
    """Mean over batch, sum over features (model.py:541-542)."""
    return ((x - recon) ** 2).mean(axis=0).sum()


def log_mse_recon(x, recon, eps: float = 1e-5):
    """Rybkin sigma-VAE log-MSE (model.py:543-548).

    0.5 * D * mean_b[ log(2*pi*mse_b + eps) + 1 ],
    D = feature count, mse_b = per-sample feature-mean squared error.
    """
    d = jnp.asarray(x[0].size, x.dtype)
    axes = tuple(range(1, x.ndim))
    per_sample_mse = ((x - recon) ** 2).mean(axis=axes)
    return (0.5 * d * (jnp.log(2.0 * jnp.pi * per_sample_mse + eps) + 1.0)).mean()


def recon_loss(x, recon, is_log_mse: bool = False):
    return log_mse_recon(x, recon) if is_log_mse else mse_recon(x, recon)


def kl_divergence(mu, log_var):
    """KL(q(z|x) || N(0, I)), mean over batch, sum over dims (model.py:550)."""
    return (-0.5 * (1.0 + log_var - mu**2 - jnp.exp(log_var))).mean(axis=0).sum()


def kl_per_sample(mu, log_var):
    """Per-sample KL, summed over latent dims (lipschitz.py:62)."""
    return -0.5 * jnp.sum(1.0 + log_var - mu**2 - jnp.exp(log_var), axis=-1)


def latent_recon_loss(z_input, z_recon):
    """((z_in - z_rec)**2).mean(axis=0).sum() on [L, B, D] stacks
    (model.py:603): mean over MC samples, sum over batch and dims."""
    return ((z_input - z_recon) ** 2).mean(axis=0).sum()


def pairwise_reg(loss_reg, z_input):
    """LRVAE `pwise_reg` batch-statistics KL mixed 50/50 (model.py:608-611).

    Replicates the reference's broadcasting exactly: with z [L, B, D],
    mu_zp = z.mean(axis=1, keepdims=True) -> [L, 1, D],
    logvar_zp = log(((z - mu_zp)**2).mean(axis=1)) -> [L, D];
    the (1 + logvar_zp - mu_zp^2 - exp(logvar_zp)) expression broadcasts
    to [L, L, D]; .mean(axis=1).sum() over that.
    """
    mu_zp = z_input.mean(axis=1, keepdims=True)
    logvar_zp = jnp.log(((z_input - mu_zp) ** 2).mean(axis=1))
    term = -0.5 * (1.0 + logvar_zp - mu_zp**2 - jnp.exp(logvar_zp))
    return loss_reg / 2.0 + term.mean(axis=1).sum() / 2.0
