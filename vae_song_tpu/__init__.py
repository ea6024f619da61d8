"""vae_song_tpu — a TPU-native (JAX/XLA/Pallas/pjit) VAE research framework.

A ground-up rebuild of the capabilities of the `vae-song` reference
(autoencoder / beta-VAE / LR-VAE / LID-VAE / SetVAE model zoo, synthetic +
image + point-cloud data layers, Lipschitz/KL field analysis, metrics,
experiment drivers), designed TPU-first:

  * all compute paths are jit-compiled XLA with static shapes,
  * the LID-VAE Brenier-map decoder is `jax.grad` of an ICNN potential
    (differentiable end-to-end under `jit`+`grad`),
  * the LR-VAE staged multi-term backward is a single `jax.vjp` with two
    cotangent pulls (one forward, two backwards vs. torch's three),
  * Chamfer distance runs as a tiled kernel that never materialises the
    full [B, N, N] matrix in HBM,
  * data parallelism is `shard_map` over a `jax.sharding.Mesh` with
    `psum` gradient reduction over ICI.

Reference behavior citations use `<file>:<line>` paths relative to the
upstream repo (see SURVEY.md).
"""

__version__ = "0.1.0"

from vae_song_tpu import config as config  # noqa: F401
