#!/usr/bin/env python
"""Round-5 step split, part B: the two removal probes part A left open
— LayerNorm and FFN — completing the non-attention-slice evidence for
VERDICT r4 item 1 (the split's Adam probe already measured ~0.1 ms, so
there is nothing to fuse there).

  noln    every transformer LayerNorm replaced by identity
  noffn   the two-matmul FFN (and its dropout) removed from every layer

Both probes change the param tree (timing-only; gradients differ).

  python scripts/ab_step_split_r5b.py > /tmp/ab_step_split_r5b.log 2>&1
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax

from ab_step_split_r5 import K_PROBE, production_step, time_scan_step


class _IdentityLN(nn.Module):
    """Drop-in LayerNorm stand-in with the same constructor surface."""

    epsilon: float = 1e-5
    dtype: object = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        return x


def main():
    print("devices:", jax.devices(), flush=True)
    os.environ["VST_FUSED_QKV"] = "0"
    results = {}

    real_ln = nn.LayerNorm
    nn.LayerNorm = _IdentityLN
    try:
        results["noln"] = time_scan_step("noln", production_step(K_PROBE),
                                         K_PROBE)
    finally:
        nn.LayerNorm = real_ln

    import vae_song_tpu.models.setvae as sv

    class EncNoFFN(sv.TransformerEncoderLayer):
        @nn.compact
        def __call__(self, x, train=False):
            attn = sv.MultiHeadAttention(
                num_heads=self.num_heads, d_model=self.d_model,
                dropout_rate=self.dropout_rate,
                compute_dtype=self.compute_dtype,
                use_flash=self.use_flash, seq_axis=self.seq_axis,
                seq_ring=self.seq_ring,
            )(x, x, train)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype)(x + attn)

    class DecNoFFN(sv.TransformerDecoderLayer):
        def cross_ffn_block(self, tgt, memory, train=False):
            ca = self.cross_attn(tgt, memory, train)
            return self.norm2(tgt + ca)

    real_enc, real_dec = sv.TransformerEncoderLayer, sv.TransformerDecoderLayer
    sv.TransformerEncoderLayer, sv.TransformerDecoderLayer = EncNoFFN, DecNoFFN
    try:
        results["noffn"] = time_scan_step("noffn", production_step(K_PROBE),
                                          K_PROBE)
    finally:
        sv.TransformerEncoderLayer, sv.TransformerDecoderLayer = real_enc, real_dec

    print("\n==== part B summary (ms/step; base was 52.33 @K=32) ====")
    for k, v in results.items():
        print(f"  {k:8s} {v:7.2f}  (delta vs base {52.33 - v:+.2f})")


if __name__ == "__main__":
    main()
