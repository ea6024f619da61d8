"""Frechet Inception Distance — the metric math, extractor-agnostic,
with an Inception-comparable path when local weights are available.

The reference shells out to the external `pytorch_fid` package
(main.py:349-360) and only when generation-only mode runs. Here the
Frechet distance itself is implemented (and tested) locally:

    FID = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^{1/2})

Extractor selection (`default_extractor`):
  * env `VST_FID_WEIGHTS=<path>` (or an explicit weights_path) -> the
    InceptionV3 pool3 graph in JAX (ops/inception.py) loading those
    torchvision-named weights — scores are then comparable to
    published pytorch_fid numbers.
  * otherwise -> the seeded random-conv embedding below: scores are
    self-consistent within this framework but NOT comparable to
    Inception-FID (weights cannot be downloaded on a no-egress box).
"""

import os

import numpy as np
from scipy import linalg


def gaussian_stats(features):
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (standard FID formula)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats_real, feats_fake) -> float:
    mu1, s1 = gaussian_stats(feats_real)
    mu2, s2 = gaussian_stats(feats_fake)
    return frechet_distance(mu1, s1, mu2, s2)


def fid_score(extractor, real_batches, fake_batches) -> float:
    """extractor(batch) -> [B, D] features; batches are iterables."""
    fr = np.concatenate([np.asarray(extractor(b)) for b in real_batches])
    ff = np.concatenate([np.asarray(extractor(b)) for b in fake_batches])
    return fid_from_features(fr, ff)


def default_extractor(image_shape, seed: int = 0,
                      weights_path: str | None = None):
    """Inception pool3 features when weights are available (explicit
    path or $VST_FID_WEIGHTS), else the seeded random-conv fallback.
    Returns (extractor, is_inception)."""
    path = weights_path or os.environ.get("VST_FID_WEIGHTS")
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"VST_FID_WEIGHTS points to a missing file: {path}"
            )
        from vae_song_tpu.ops.inception import InceptionV3Features

        return InceptionV3Features(path), True
    return make_conv_feature_extractor(image_shape, seed=seed), False


def make_conv_feature_extractor(image_shape, seed: int = 0, feature_dim: int = 64):
    """Fixed seeded random-conv embedding for FID on a no-egress box.

    This is NOT InceptionV3 (whose weights cannot be downloaded here) —
    it is an untrained, deterministically-initialized 3-layer stride-2
    CNN with LeakyReLU, global mean pool, and a random linear projection.
    Random-CNN features are a standard FID proxy when Inception is
    unavailable; scores are comparable between runs of this framework
    (same seed -> same embedding) but not to Inception-FID numbers.

    image_shape: (H, W, C). Returns a jitted callable [B,H,W,C] -> [B,D].
    """
    import jax
    import jax.numpy as jnp

    _h, _w, c = image_shape
    chans = [c, 8, 16, 32]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(chans))
    convs = [
        np.asarray(
            jax.random.normal(keys[i], (3, 3, chans[i], chans[i + 1]))
            * np.sqrt(2.0 / (9 * chans[i]), dtype=np.float32)
        )
        for i in range(len(chans) - 1)
    ]
    proj = np.asarray(
        jax.random.normal(keys[-1], (chans[-1], feature_dim))
        * np.sqrt(1.0 / chans[-1], dtype=np.float32)
    )

    @jax.jit
    def extract(x):
        h = jnp.asarray(x, jnp.float32)
        if h.ndim == 3:
            h = h[..., None]
        for w in convs:
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(w), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.leaky_relu(h, 0.2)
        return h.mean(axis=(1, 2)) @ jnp.asarray(proj)

    return extract
