"""Initializers matching the *effective* init of the reference.

The reference's `VAE._initialize_weights` (model.py:15-23) runs inside
`VAE.__init__`, which subclasses call *before* constructing any
submodule — so `self.modules()` is empty and the Kaiming re-init is a
no-op. The weights that actually train are torch's defaults:

  * `nn.Linear` / `nn.Conv2d`: kaiming_uniform_(a=sqrt(5)) on the weight
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), ...).
  * `nn.BatchNorm*`: weight=1, bias=0 (also what torch defaults to).
  * `PositiveLinear` (module.py:97-114): kaiming_uniform_(a=sqrt(5)),
    i.e. the same U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

We replicate those here so training dynamics start from the same
distribution family as the reference.
"""

import numpy as np
import jax.numpy as jnp
from jax import random
from jax.nn.initializers import variance_scaling

# kaiming_uniform(a=sqrt(5)) == uniform with bound 1/sqrt(fan_in)
# == variance_scaling(scale=1/3, fan_in, uniform):
#    bound = sqrt(3 * scale / fan_in) = 1/sqrt(fan_in)
torch_linear_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / float(np.sqrt(fan_in)) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_positive_linear_init():
    """PositiveLinear weight init (module.py:104): kaiming_uniform(a=sqrt(5)).

    Stored as (in, out) here (JAX convention); the bound depends only on
    fan_in so the distribution matches the reference's (out, in) layout.
    """
    return variance_scaling(1.0 / 3.0, "fan_in", "uniform")
