#!/usr/bin/env python
"""In-step A/B for the fused Pallas FFN (ops/ffn.py): the production
bf16 scanned-multistep SetVAE step with VST_FUSED_FFN off vs on, at the
probe K and the trainer-selected K=117 — the same methodology that
decided fused QKV (scripts/ab_step_split_r5.py) and every block-size
choice (CLAUDE.md: in-step numbers decide, standalone rankings can
invert).

  python scripts/ab_ffn_step.py > /tmp/ab_ffn_step.log 2>&1
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ab_step_split_r5 import K_PROBE, production_step, time_scan_step


def main():
    print("devices:", jax.devices(), flush=True)
    os.environ["VST_FUSED_QKV"] = "0"
    r = {}

    os.environ["VST_FUSED_FFN"] = "0"
    r["base"] = time_scan_step("base", production_step(K_PROBE), K_PROBE)
    os.environ["VST_FUSED_FFN"] = "1"
    r["ffn"] = time_scan_step("ffn", production_step(K_PROBE), K_PROBE)

    os.environ["VST_FUSED_FFN"] = "0"
    r["base@117"] = time_scan_step(
        "base@117", production_step(117), 117, n_disp=2)
    os.environ["VST_FUSED_FFN"] = "1"
    r["ffn@117"] = time_scan_step(
        "ffn@117", production_step(117), 117, n_disp=2)

    print("\n==== summary (ms/step) ====")
    for k, v in r.items():
        print(f"  {k:10s} {v:7.2f}")
    print(f"\n  fused FFN in-step delta @K={K_PROBE}: "
          f"{r['base'] - r['ffn']:+.2f} ms")
    print(f"  fused FFN in-step delta @K=117: "
          f"{r['base@117'] - r['ffn@117']:+.2f} ms")


if __name__ == "__main__":
    main()
