"""NN building blocks (TPU-native re-design of the reference's module.py).

Layout conventions (TPU-idiomatic, unlike the torch reference):
  * images are NHWC (torch reference is NCHW: module.py:11,36),
  * Dense kernels are (in, out).

All blocks are flax.linen modules; BatchNorm carries running statistics
in the `batch_stats` collection (train mode uses batch statistics and
updates the running ones, mirroring torch BN semantics with
momentum=0.1 -> flax momentum=0.9, eps=1e-5).
"""

import jax.numpy as jnp
import flax.linen as nn

from vae_song_tpu.nn.initializers import (
    torch_linear_kernel_init,
    torch_bias_init,
    torch_positive_linear_init,
)

LRELU_SLOPE = 0.01  # torch nn.LeakyReLU default


def lrelu(x, slope: float = LRELU_SLOPE):
    return nn.leaky_relu(x, negative_slope=slope)


class _DenseLeaf(nn.Module):
    """Registers the exact {kernel, bias} subtree an nn.Dense child
    would (same names, shapes, initializers, RNG fold path) WITHOUT
    issuing the matmul — the param-holder half of Dense(params_only=
    True), used by fused kernels that consume the raw weights
    (ops/ffn.py). Mirrors ops/attention.py:_InProj."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_linear_kernel_init,
            (self.in_features, self.features),
        )
        bias = (
            self.param(
                "bias", torch_bias_init(self.in_features),
                (self.features,),
            )
            if self.use_bias else None
        )
        return kernel, bias


class Dense(nn.Module):
    """nn.Linear equivalent with torch-default initialization.

    `dtype` is the flax compute dtype: params stay f32, the matmul runs
    in `dtype` (bf16 feeds the v5e MXU at full rate).

    `params_only=True` registers the identical param subtree and
    returns the raw (kernel, bias) leaves instead of applying the
    matmul — for callers that feed the weights to a fused kernel
    (models/setvae.py's FFN branch -> ops/ffn.py). Checkpoints are
    interchangeable between the two modes (same tree, same init)."""

    features: int
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        fan_in = x.shape[-1]
        if params_only:
            return _DenseLeaf(
                self.features, fan_in, self.use_bias, name="Dense_0"
            )()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class Conv(nn.Module):
    """nn.Conv2d equivalent (NHWC) with torch-default initialization."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class BatchNorm(nn.Module):
    """torch BatchNorm1d/2d equivalent (reduces over all but channel axis)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
        )(x)


class MLPBlock(nn.Module):
    """Linear + BN + LeakyReLU (model.py:198-202 pattern)."""

    features: int
    dtype: object = None  # bf16: matmul + activations; BN stats stay f32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Dense(self.features, dtype=self.dtype)(x)
        x = BatchNorm()(x, train)
        return lrelu(x)


class ResidualMLPBlock(nn.Module):
    """Linear analogue of the residual conv block (module.py:63-93)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        out = Dense(self.features, dtype=self.dtype)(x)
        out = BatchNorm()(out, train)
        out = lrelu(out)
        out = Dense(self.features, dtype=self.dtype)(out)
        out = BatchNorm()(out, train)
        if x.shape[-1] == self.features:
            identity = x
        else:
            identity = Dense(self.features, dtype=self.dtype)(x)
            identity = BatchNorm()(identity, train)
        return lrelu(out + identity)


class ResidualConvBlock(nn.Module):
    """Conv-BN-LReLU -> Conv-BN, + (1x1-projected) identity, LReLU
    (module.py:29-59). NHWC."""

    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        out = Conv(self.features, 3, self.stride, 1, dtype=self.dtype)(x)
        out = BatchNorm()(out, train)
        out = lrelu(out)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype)(out)
        out = BatchNorm()(out, train)
        if self.stride == 1 and x.shape[-1] == self.features:
            identity = x
        else:
            identity = Conv(self.features, 1, self.stride, 0, dtype=self.dtype)(x)
            identity = BatchNorm()(identity, train)
        return lrelu(out + identity)


class PlainConvolution(nn.Module):
    """2x(Conv3x3 + BN + LeakyReLU), no skip (module.py:4-26)."""

    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, 3, self.stride, 1, dtype=self.dtype)(x)
        x = BatchNorm()(x, train)
        x = lrelu(x)
        x = Conv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        x = BatchNorm()(x, train)
        return lrelu(x)


class PositiveLinear(nn.Module):
    """Weight-positivity linear layer for ICNN (module.py:97-114).

    `is_exp=True`: y = x @ exp(W); else y = x @ clamp(W, min=1e-2).
    No bias (matches F.linear(input, weight) with no bias arg).
    """

    features: int
    is_exp: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            torch_positive_linear_init(),
            (x.shape[-1], self.features),
        )
        if self.is_exp:
            w = jnp.exp(w)
        else:
            w = jnp.clip(w, a_min=1e-2)
        return x @ w


class ICNN(nn.Module):
    """Input-convex NN (module.py:117-148).

    z0 = LReLU_0.2(A0 x)^2; z_{k+1} = LReLU_0.2(W_k+ z_k + A_k x);
    final output in R^1. Convex in x because the W_k are positive and
    the activation is convex+nondecreasing (squared-LReLU base case).
    """

    hidden_channel: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        z = act(Dense(self.hidden_channel, use_bias=True)(x)) ** 2
        for _ in range(self.num_layers - 1):
            z = act(PositiveLinear(self.hidden_channel)(z) + Dense(self.hidden_channel)(x))
        z = act(PositiveLinear(1)(z) + Dense(1)(x))
        return z


class LinearModuleEP(nn.Module):
    """Non-convex ablation twin of ICNN (module.py:151-182); plain Linear
    in place of PositiveLinear, final W maps hidden -> in_channel."""

    hidden_channel: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        in_channel = x.shape[-1]
        z = act(Dense(self.hidden_channel)(x)) ** 2
        for _ in range(self.num_layers - 1):
            z = act(Dense(self.hidden_channel)(z) + Dense(self.hidden_channel)(x))
        z = act(Dense(in_channel)(z) + Dense(1)(x))
        return z
