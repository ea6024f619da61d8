"""LID-VAE: Lipschitz-Invertible-Decoder VAE (Wang et al.), model.py:637-886.

The decoder is two ICNN Brenier maps composed with an identity
injection matrix B:

    x = grad_z [ ICNN_1(z) + (il/2)*||z||^2 ]
    x = x @ B^T            (B = eye(data_dim, latent_dim))
    y = grad_x [ ICNN_2(x) + (il/2)*||x||^2 ]

The reference computes the map with `torch.autograd.grad(...,
create_graph=True)` (model.py:818-830); here it is `jax.grad` of the
scalar potential, which XLA differentiates natively — the decode is
trainable (second-order) and usable inside jitted Lipschitz probes with
no special casing.

Reference defects fixed (not replicated):
  * `data_type` undefined for image datasets (model.py:685/703 NameError);
  * `forward` rejecting the `L=` kwarg main.py passes (model.py:833).
Encode applies softplus to the second encoder half and uses it as
log-variance downstream (model.py:812-816) — quirk kept.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vae_song_tpu.nn.blocks import ICNN
from vae_song_tpu.models.flexible import (
    ConvEncoder2D,
    MLPEncoder2D,
    resolve_dataset_defaults,
)
from vae_song_tpu.ops import losses

# LIDVAE's own per-dataset defaults differ from FlexibleVAE
# (model.py:660-687): celeba latent 64, mnist/fashionmnist latent 32,
# omniglot hidden (32,64,128).
LIDVAE_DATASET_OVERRIDES = {
    "celeba": dict(latent_channel=64),
    "mnist": dict(latent_channel=32),
    "fashionmnist": dict(latent_channel=32),
    "omniglot": dict(hidden_channels=(32, 64, 128)),
}


class LIDVAE(nn.Module):
    in_channel: int = 1
    latent_channel: int = 32
    hidden_channels: Tuple[int, ...] = (32, 64, 128)
    icnn_channels: Tuple[int, int] = (512, 1024)
    input_dim: int = 28
    inverse_lipschitz: float = 0.0
    beta: float = 1.0
    is_log_mse: bool = False
    data_type: str = "2d"
    grad_mode: str = "composite"

    @classmethod
    def for_dataset(cls, dataset: str, hidden_channels=None, **kwargs):
        defaults = resolve_dataset_defaults(dataset, hidden_channels)
        for k, v in LIDVAE_DATASET_OVERRIDES.get(dataset, {}).items():
            if k == "hidden_channels" and hidden_channels is not None:
                continue
            defaults[k] = v
        defaults.update(kwargs)
        return cls(**defaults)

    @property
    def il_factor(self):
        return self.inverse_lipschitz / 2.0

    def setup(self):
        if len(self.icnn_channels) != 2:
            raise ValueError("2-length array was expected for `icnn_channels`")
        if self.data_type == "1d":
            self.data_dim = self.input_dim * self.in_channel
            self.encoder = MLPEncoder2D(self.hidden_channels, self.latent_channel * 2)
        else:
            self.data_dim = (self.input_dim**2) * self.in_channel
            self.encoder = ConvEncoder2D(self.hidden_channels, self.latent_channel * 2)
        self.icnn1 = ICNN(self.icnn_channels[0])
        self.icnn2 = ICNN(self.icnn_channels[1])

    def encode(self, x, train: bool = False):
        ret = self.encoder(x, train)
        mu, var = jnp.split(ret, 2, axis=1)
        # softplus keeps the "log_var" positive — reference quirk
        # (model.py:812-816): downstream code treats it as log-variance.
        return mu, jax.nn.softplus(var)

    def _brenier(self, icnn, v):
        """grad of [ICNN(u) + il_factor*||u||^2] summed over batch."""
        il = self.il_factor

        def potential(u):
            return (icnn(u) + il * (u**2).sum(axis=1, keepdims=True)).sum()

        return jax.grad(potential)(v)

    def decode(self, z, train: bool = False):
        x = self._brenier(self.icnn1, z)
        # B = eye(data_dim, latent): zero-pad the latent gradient up to
        # the data dimension (model.py:771-775 "identity injective map")
        pad = self.data_dim - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        elif pad < 0:
            x = x[:, : self.data_dim]
        y = self._brenier(self.icnn2, x)
        if self.data_type == "2d":
            y = y.reshape(y.shape[0], self.input_dim, self.input_dim, self.in_channel)
        return y

    def __call__(
        self,
        x,
        L: int = 1,
        latent_recon: bool = False,
        latent_rand_sampling: bool = True,
        train: bool = False,
    ):
        """forward_vae by default; forward_Ex when latent_recon=True
        (model.py:833-856). `L` accepted for driver compatibility; the
        reference LIDVAE is single-sample."""
        mu, log_var = self.encode(x, train)
        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        recon = self.decode(z, train)
        if latent_recon:
            z_recon, _ = self.encode(recon, train)
            return recon, mu, log_var, z, z_recon
        return recon, mu, log_var, z, None

    def loss(self, x, recon, mu, log_var, z_input=None, z_recon=None, wu_alpha: float = 0.0):
        loss_recon = losses.recon_loss(x, recon, self.is_log_mse)
        loss_reg = losses.kl_divergence(mu, log_var)
        total = loss_recon + loss_reg * self.beta
        return total, loss_recon, loss_reg, jnp.zeros(())
