"""Sequence-parallel attention: point axis sharded over the mesh,
result must equal single-device full attention."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vae_song_tpu.ops.attention import _xla_attention, sequence_sharded_attention
from vae_song_tpu.parallel.mesh import make_mesh


def test_sequence_sharded_matches_full(key):
    mesh = make_mesh()  # 8 devices on 'data' used as the sequence axis
    b, n, h, d = 2, 64, 2, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    full = _xla_attention(q, k, v, scale, compute_dtype=jnp.float32)

    def per_device(qc, kc, vc):
        return sequence_sharded_attention(qc, kc, vc, scale, "data",
                                          compute_dtype=jnp.float32)

    sharded = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
            out_specs=P(None, "data"),
            check_vma=False,
        )
    )
    got = sharded(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-3, atol=2e-3)
