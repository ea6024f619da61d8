#!/usr/bin/env python
"""A/B the lane-packed dense-attention kernel (VST_DENSE_ATTN_PACKED=1)
against the default BHND dense kernel on the real chip.

The packed variant reads q/k/v in the model's [B, N, H*D] layout (two
64-wide heads per 128-lane block), skipping the BNHD <-> BHND HBM
transposes around ops/denseattn.dense_attention. Run on a quiet chip:

  python scripts/ab_packed_attn.py            # f32 + bf16 single-step A/B
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(tag, packed, mixed_precision):
    # env must be set before the model traces; each config runs in a
    # subprocess so the jit caches can't leak across arms
    import subprocess

    env = dict(os.environ)
    # packed is the default since round 3 — the base arm must opt out
    env["VST_DENSE_ATTN_PACKED"] = "1" if packed else "0"
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from bench import measure_setvae_step;"
        "ms, _ = measure_setvae_step(mixed_precision=%r);"
        "print('RESULT %s', ms)"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), mixed_precision, tag)
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    for mp in (False, True):
        p = "bf16" if mp else "f32"
        run(f"base-{p}", packed=False, mixed_precision=mp)
        run(f"packed-{p}", packed=True, mixed_precision=mp)
