"""FlexibleVAE family: configurable encoder/decoder VAE + NaiveAE /
VanillaVAE (beta-VAE) / LRVAE variants.

Re-designed from the reference's model.py:69-633 for TPU:
  * NHWC image layout, static shapes, everything jit-compatible;
  * the MC-sample double-decode forward (model.py:418-447) is expressed
    with `lax.stop_gradient` in place of `.detach()`;
  * per-dataset defaults mirror model.py:94-120;
  * the ConvTranspose pyramid reproduces the reference's
    `transpose_padding` output-size rule (model.py:140-145) with
    'SAME' transposed convs + crop.

Known reference defect fixed here (documented, not replicated):
`make_encoder_mlp_2d` (model.py:214-237) wires the first Linear with
in_features == in_channel after a Flatten, which crashes for any image
input; our MLP 2-D encoder takes the flattened feature count.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vae_song_tpu.nn.blocks import (
    BatchNorm,
    Conv,
    Dense,
    MLPBlock,
    ResidualConvBlock,
    ResidualMLPBlock,
    lrelu,
)
from vae_song_tpu.ops import losses

# Per-dataset architecture defaults (model.py:94-120)
DATASET_DEFAULTS = {
    "celeba": dict(in_channel=3, latent_channel=128, hidden_channels=(32, 64, 128, 256), input_dim=64),
    "mnist": dict(in_channel=1, latent_channel=28, hidden_channels=(32, 64, 128), input_dim=28),
    "fashionmnist": dict(in_channel=1, latent_channel=28, hidden_channels=(32, 64, 128), input_dim=28),
    "cifar10": dict(in_channel=3, latent_channel=128, hidden_channels=(32, 64, 128, 256), input_dim=32),
    "omniglot": dict(in_channel=1, latent_channel=32, hidden_channels=(32, 64, 128, 256), input_dim=28),
    "pinwheel": dict(in_channel=2, latent_channel=2, hidden_channels=(2, 2, 2, 2), input_dim=1),
    "chessboard": dict(in_channel=2, latent_channel=2, hidden_channels=(2, 2, 2, 2), input_dim=1),
}


def resolve_dataset_defaults(dataset: str, hidden_channels=None):
    if dataset not in DATASET_DEFAULTS:
        raise ValueError(f"Invalid dataset: {dataset}")
    d = dict(DATASET_DEFAULTS[dataset])
    if hidden_channels is not None:
        d["hidden_channels"] = tuple(hidden_channels)
    d["data_type"] = "1d" if dataset in ("pinwheel", "chessboard") else "2d"
    return d


def transpose_padding_schedule(input_dim: int, depth: int):
    """Output-padding schedule for the ConvTranspose pyramid
    (model.py:140-145). Returns (fc_dim, [pad_0 ... pad_{depth-1}])."""
    fc = input_dim
    tp = []
    for _ in range(depth):
        tp.append((fc + 1) % 2)
        fc = (fc - 1) // 2 + 1
    tp.reverse()
    return fc, tp


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

class MLPEncoder1D(nn.Module):
    """Linear+BN+LReLU stack ending at 2*latent — note the reference
    applies BN+LReLU to the final (mu, logvar) output too
    (model.py:192-203 via _build_mlp); we keep that quirk."""

    hidden_channels: Tuple[int, ...]
    out_features: int
    residual: bool = False
    compute_dtype: object = None  # bf16 trunk; the final (mu, logvar)
    # block stays f32 so the reparameterization/KL see full precision

    @nn.compact
    def __call__(self, x, train: bool):
        for ch in self.hidden_channels:
            if self.residual:
                x = ResidualMLPBlock(ch, dtype=self.compute_dtype)(x, train)
            else:
                x = MLPBlock(ch, dtype=self.compute_dtype)(x, train)
        if self.residual:
            return ResidualMLPBlock(self.out_features, dtype=jnp.float32)(x, train)
        return MLPBlock(self.out_features, dtype=jnp.float32)(x, train)


class MLPEncoder2D(nn.Module):
    """Flatten + MLP blocks + linear head (fixed model.py:214-237)."""

    hidden_channels: Tuple[int, ...]
    out_features: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.reshape(x.shape[0], -1)
        for ch in self.hidden_channels:
            x = MLPBlock(ch, dtype=self.compute_dtype)(x, train)
        x = MLPBlock(self.out_features, dtype=self.compute_dtype)(x, train)
        return Dense(self.out_features, dtype=jnp.float32)(x)


class ConvEncoder2D(nn.Module):
    """Stride-2 residual conv pairs + FC head (model.py:239-261). NHWC."""

    hidden_channels: Tuple[int, ...]
    out_features: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        for ch in self.hidden_channels:
            x = ResidualConvBlock(ch, stride=2, dtype=self.compute_dtype)(x, train)
            x = ResidualConvBlock(ch, stride=1, dtype=self.compute_dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        x = MLPBlock(self.out_features, dtype=self.compute_dtype)(x, train)
        return Dense(self.out_features, dtype=jnp.float32)(x)


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

class MLPDecoder1D(nn.Module):
    """Hidden MLP blocks + plain final Linear (model.py:263-297)."""

    hidden_channels: Tuple[int, ...]
    out_features: int
    residual: bool = False
    compute_dtype: object = None

    @nn.compact
    def __call__(self, z, train: bool):
        x = z
        for ch in self.hidden_channels:
            if self.residual:
                x = ResidualMLPBlock(ch, dtype=self.compute_dtype)(x, train)
            else:
                x = MLPBlock(ch, dtype=self.compute_dtype)(x, train)
        if self.residual:
            return ResidualMLPBlock(self.out_features, dtype=jnp.float32)(x, train)
        return Dense(self.out_features, dtype=jnp.float32)(x)


class MLPDecoder2D(nn.Module):
    """Two double-Linear blocks: latent -> D/2 -> D, reshape to image
    (model.py:330-364). Output NHWC."""

    in_channel: int
    input_dim: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, z, train: bool):
        d_half = (self.input_dim**2) * self.in_channel // 2
        d_full = (self.input_dim**2) * self.in_channel
        x = MLPBlock(d_half, dtype=self.compute_dtype)(z, train)
        x = MLPBlock(d_half, dtype=self.compute_dtype)(x, train)
        x = MLPBlock(d_full, dtype=self.compute_dtype)(x, train)
        x = Dense(d_full, dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], self.input_dim, self.input_dim, self.in_channel)


class UpConv(nn.Module):
    """ConvTranspose(k3, s2) that reproduces torch's
    out = 2*in - 1 + output_padding via 'SAME' transposed conv + crop.

    Init parity: torch ConvTranspose2d weight is (in, out, kH, kW) so
    its kaiming_uniform(a=sqrt(5)) fan is out_channels*k*k — i.e.
    'fan_out' of the flax (kh, kw, in, out) kernel."""

    features: int
    output_padding: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from jax.nn.initializers import variance_scaling
        from vae_song_tpu.nn.initializers import torch_bias_init

        fan = self.features * 9
        y = nn.ConvTranspose(
            self.features,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=variance_scaling(1.0 / 3.0, "fan_out", "uniform"),
            bias_init=torch_bias_init(fan),
        )(x)
        if self.output_padding == 0:
            y = y[:, :-1, :-1, :]
        return y


class ConvDecoder2D(nn.Module):
    """FC + ResBlock + ConvTranspose pyramid (model.py:367-404). NHWC.

    `hidden_channels` is already reversed (decoder order, widest first).
    """

    in_channel: int
    hidden_channels: Tuple[int, ...]
    fc_dim: int
    transpose_padding: Tuple[int, ...]
    compute_dtype: object = None

    @nn.compact
    def __call__(self, z, train: bool):
        h0 = self.hidden_channels[0]
        x = MLPBlock(h0 * self.fc_dim**2, dtype=self.compute_dtype)(z, train)
        x = x.reshape(x.shape[0], self.fc_dim, self.fc_dim, h0)
        x = ResidualConvBlock(h0, stride=1, dtype=self.compute_dtype)(x, train)
        for ch, pad in zip(self.hidden_channels[1:], self.transpose_padding[:-1]):
            x = UpConv(ch, pad, dtype=self.compute_dtype)(x)
            x = BatchNorm()(x, train)
            x = lrelu(x)
        last = self.hidden_channels[-1]
        x = UpConv(last, self.transpose_padding[-1], dtype=self.compute_dtype)(x)
        x = BatchNorm()(x, train)
        x = lrelu(x)
        # final size-preserving ConvTranspose(k3, s1, p1) == size-preserving
        # conv; torch's ConvTranspose init fan here is in_channel*9
        from jax.nn.initializers import variance_scaling
        from vae_song_tpu.nn.initializers import torch_bias_init

        x = nn.Conv(
            self.in_channel,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=[(1, 1)] * 2,
            dtype=jnp.float32,  # reconstruction output always f32
            kernel_init=variance_scaling(1.0 / 3.0, "fan_out", "uniform"),
            bias_init=torch_bias_init(self.in_channel * 9),
        )(x)
        return x


# ---------------------------------------------------------------------------
# FlexibleVAE + variants
# ---------------------------------------------------------------------------

class FlexibleVAE(nn.Module):
    """Configurable-factory VAE (model.py:69-501).

    Call signature: `model.apply(vars, x, L=..., latent_rand_sampling=...,
    train=..., rngs={'sampling': key}, mutable=['batch_stats'])`.
    Returns (recon, mu, log_var, z_stack_detached, z_recon_stack) exactly
    like the reference forward (model.py:418-447).
    """

    in_channel: int = 1
    latent_channel: int = 32
    hidden_channels: Tuple[int, ...] = (32, 64, 128)
    input_dim: int = 28
    beta: float = 1.0
    alpha: float = 0.0
    is_log_mse: bool = False
    z_source: str = "Ex"
    pwise_reg: bool = False
    variational: bool = True
    encoder_type: str = "mlp"
    decoder_type: str = "mlp"
    residual_connection: bool = False
    fixed_var: float | bool = False
    data_type: str = "2d"
    mixed_precision: bool = False  # bf16 trunk compute; f32 params,
    # BN statistics, (mu, logvar) heads and reconstruction outputs

    # which gradient path the trainer uses; LRVAE overrides to 'staged'
    grad_mode: str = "composite"

    @classmethod
    def for_dataset(cls, dataset: str, hidden_channels=None, **kwargs):
        defaults = resolve_dataset_defaults(dataset, hidden_channels)
        defaults.update(kwargs)
        return cls(**defaults)

    def setup(self):
        fc_dim, tp = transpose_padding_schedule(self.input_dim, len(self.hidden_channels))
        cdt = jnp.bfloat16 if self.mixed_precision else None
        if self.data_type == "1d" and self.encoder_type == "mlp":
            self.encoder = MLPEncoder1D(
                self.hidden_channels, self.latent_channel * 2,
                residual=self.residual_connection, compute_dtype=cdt,
            )
        elif self.encoder_type == "mlp":
            self.encoder = MLPEncoder2D(
                self.hidden_channels, self.latent_channel * 2, compute_dtype=cdt
            )
        elif self.encoder_type == "conv":
            self.encoder = ConvEncoder2D(
                self.hidden_channels, self.latent_channel * 2, compute_dtype=cdt
            )
        else:
            raise ValueError(f"Invalid encoder type: {self.data_type} {self.encoder_type}")

        rev = tuple(reversed(self.hidden_channels))
        if self.data_type == "1d" and self.decoder_type == "mlp":
            self.decoder = MLPDecoder1D(
                rev, self.in_channel, residual=self.residual_connection,
                compute_dtype=cdt,
            )
        elif self.decoder_type == "mlp":
            self.decoder = MLPDecoder2D(
                self.in_channel, self.input_dim, compute_dtype=cdt
            )
        elif self.decoder_type == "conv":
            self.decoder = ConvDecoder2D(
                self.in_channel, rev, fc_dim, tuple(tp), compute_dtype=cdt
            )
        else:
            raise ValueError(f"Invalid decoder type: {self.data_type} {self.decoder_type}")

    # --- core API -----------------------------------------------------------

    def encode(self, x, train: bool = False):
        ret = self.encoder(x, train)
        mu, log_var = jnp.split(ret, 2, axis=1)
        return mu, log_var

    def decode(self, z, train: bool = False):
        return self.decoder(z, train)

    def __call__(self, x, L: int = 1, latent_rand_sampling: bool = True, train: bool = False):
        mu, log_var = self.encode(x, train)
        b = x.shape[0]

        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), (L, *mu.shape), mu.dtype)
            z_stack = mu[None] + eps * jnp.exp(0.5 * log_var)[None]  # [L, B, D]
        else:
            z_stack = mu[None]
            L = 1

        z_flat = z_stack.reshape(-1, z_stack.shape[-1])  # [L*B, D]

        # path 1: reconstruction, full graph (model.py:432)
        recon_flat = self.decode(z_flat, train)

        # path 2: latent-reconstruction — z detached, grads flow only
        # through decoder + second encoder pass (model.py:435-437)
        z_flat_det = jax.lax.stop_gradient(z_flat)
        recon_lr = self.decode(z_flat_det, train)
        z_recon_flat, _ = self.encode(recon_lr, train)

        recon = recon_flat.reshape(L, b, *recon_flat.shape[1:]).mean(axis=0)
        z_recon_stack = z_recon_flat.reshape(L, b, *z_recon_flat.shape[1:])
        z_stack_det = jax.lax.stop_gradient(z_stack)

        return recon, mu, log_var, z_stack_det, z_recon_stack

    # --- legacy z-source forwards (model.py:450-501) -------------------------

    def _maybe_fixed_var(self, log_var):
        if self.fixed_var is not False:
            return jnp.log(jnp.ones_like(log_var) * self.fixed_var)
        return log_var

    def forward_ae(self, x, train: bool = False):
        z, _ = self.encode(x, train)
        return self.decode(z, train), z, 0.0, z, 0.0

    def forward_ex(self, x, latent_rand_sampling: bool = True, train: bool = False):
        """Latent recon with z encoded from x (model.py:467-477)."""
        mu, log_var = self.encode(x, train)
        log_var = self._maybe_fixed_var(log_var)
        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        recon = self.decode(z, train)
        z_recon, _ = self.encode(recon, train)
        return recon, mu, log_var, z, z_recon

    def forward_qzx(self, x, latent_rand_sampling: bool = True, train: bool = False):
        """Latent recon with mu as the lr target (model.py:479-489)."""
        mu, log_var = self.encode(x, train)
        log_var = self._maybe_fixed_var(log_var)
        if latent_rand_sampling:
            eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        recon = self.decode(z, train)
        z_recon, _ = self.encode(recon, train)
        return recon, mu, log_var, mu, z_recon

    def forward_pz(self, x, latent_rand_sampling: bool = True, train: bool = False):
        """Latent recon with z sampled from the prior (model.py:491-501)."""
        mu, log_var = self.encode(x, train)
        log_var = self._maybe_fixed_var(log_var)
        k1, k2 = jax.random.split(self.make_rng("sampling"))
        if latent_rand_sampling:
            z = mu + jax.random.normal(k1, mu.shape, mu.dtype) * jnp.exp(0.5 * log_var)
        else:
            z = mu
        z_input = jax.random.normal(k2, mu.shape, mu.dtype) * jnp.exp(
            0.5 * jnp.ones_like(log_var)
        )
        z_recon, _ = self.encode(self.decode(z_input, train), train)
        return self.decode(z, train), mu, log_var, z_input, z_recon

    def forward_legacy(self, x, latent_rand_sampling: bool = True, train: bool = False):
        """z_source dispatch (model.py:450-461; 'regacy' in the original)."""
        if not self.variational:
            return self.forward_ae(x, train)
        if self.z_source == "pz":
            return self.forward_pz(x, latent_rand_sampling, train)
        if self.z_source == "qzx":
            return self.forward_qzx(x, latent_rand_sampling, train)
        if self.z_source == "Ex":
            return self.forward_ex(x, latent_rand_sampling, train)
        raise ValueError("Invalid z_source")

    # --- losses ---------------------------------------------------------------

    def loss(self, x, recon, mu, log_var, z_input=None, z_recon=None, wu_alpha: float = 0.0):
        """Returns (total, recon_term, reg_term_scaled, lr_term_scaled).

        Which terms receive gradient is decided by `grad_mode` in the
        trainer, mirroring the detach pattern of model.py:553/616.
        """
        raise NotImplementedError


class NaiveAE(FlexibleVAE):
    """MSE-only autoencoder (model.py:506-528)."""

    variational: bool = False

    def loss(self, x, recon, mu, log_var, z_input=None, z_recon=None, wu_alpha: float = 0.0):
        loss_recon = losses.recon_loss(x, recon, self.is_log_mse)
        return loss_recon, loss_recon, jnp.zeros(()), jnp.zeros(())


class VanillaVAE(FlexibleVAE):
    """beta-VAE: MSE + beta*KL; auxiliary terms are reported but not
    separately backpropagated (model.py:530-553)."""

    def loss(self, x, recon, mu, log_var, z_input=None, z_recon=None, wu_alpha: float = 0.0):
        loss_recon = losses.recon_loss(x, recon, self.is_log_mse)
        loss_reg = losses.kl_divergence(mu, log_var)
        if z_input is not None and z_recon is not None:
            loss_lr = losses.latent_recon_loss(z_input, z_recon)
        else:
            loss_lr = jnp.zeros(())
        total = loss_recon + loss_reg * self.beta
        return total, loss_recon, loss_reg, loss_lr


class LRVAE(FlexibleVAE):
    """Latent-reconstruction VAE (model.py:573-633): trains with the
    staged multi-term gradient (grad_mode='staged')."""

    alpha: float = 0.01
    grad_mode: str = "staged"

    def loss(self, x, recon, mu, log_var, z_input, z_recon, wu_alpha: float = 0.0):
        loss_recon = losses.recon_loss(x, recon, self.is_log_mse)
        loss_lr = losses.latent_recon_loss(z_input, z_recon)
        loss_reg = losses.kl_divergence(mu, log_var)
        if self.pwise_reg:
            loss_reg = losses.pairwise_reg(loss_reg, z_input)
        reg_scaled = loss_reg * self.beta
        lr_scaled = loss_lr * self.alpha * wu_alpha
        total = loss_recon + reg_scaled + lr_scaled
        return total, loss_recon, reg_scaled, lr_scaled
