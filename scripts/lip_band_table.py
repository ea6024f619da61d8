#!/usr/bin/env python
"""Per-cell seed-band table for the protocol-B Lipschitz grid.

Reads the 4-seed sweep tree written by lip_grid_protocolB_seeds.py
(`<root>/alpha_<a>_beta_<b>_seed_<s>/experiment_metrics.csv`) and the
reference's committed cells, and prints a markdown table where each
(alpha, beta) cell shows the [min, max] band over seeds of the median
occupied-cell KL and decoder-Lipschitz (X and Z space), plus whether
the reference's committed single value falls inside the band.

The reference's committed cells are unseeded single runs whose own
4-seed reruns span up to ~6x (PARITY.md round-2 analysis), so
band-membership — not point equality — is the meaningful comparison.

Usage:
  python scripts/lip_band_table.py --ours /root/lipgrid_r3 \
      --ref /root/reference/res_share/vis_lip_kl_exp_scc \
      [--out res_share/lip_grid_r3/band_table.md]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_lip_grid import cell_stats  # noqa: E402

ALPHAS = [0.0, 0.0001, 0.001, 0.01, 0.1, 0.2, 0.3, 0.4, 1.0]
BETAS = [0.1, 0.2, 1.0]
SEEDS = [42, 43, 44, 45]


def fmt_band(vals):
    if not vals:
        return "—"
    lo, hi = min(vals), max(vals)
    return f"[{lo:.3g}, {hi:.3g}]"


def in_band(v, vals):
    if v is None or not vals:
        return "—"
    return "✓" if min(vals) <= v <= max(vals) else "✗"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", required=True)
    ap.add_argument("--ref", default="/root/reference/res_share/vis_lip_kl_exp_scc")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seeds", nargs="+", type=int, default=SEEDS)
    args = ap.parse_args()

    lines = [
        "| α | β | X-KL band (seeds) | ref X-KL | in | X-Lip band | ref X-Lip | in "
        "| Z-KL band | ref Z-KL | in | Z-Lip band | ref Z-Lip | in |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    n_cells = n_in = 0
    for beta in BETAS:
        for alpha in ALPHAS:
            bands = {("X", 0): [], ("X", 1): [], ("Z", 0): [], ("Z", 1): []}
            for seed in args.seeds:
                p = os.path.join(args.ours, f"alpha_{alpha}_beta_{beta}_seed_{seed}",
                                 "experiment_metrics.csv")
                if not os.path.exists(p):
                    continue
                st = cell_stats(p)
                for sp in ("X", "Z"):
                    if sp in st:
                        bands[(sp, 0)].append(st[sp][0])
                        bands[(sp, 1)].append(st[sp][1])
            refp = os.path.join(args.ref, f"alpha_{alpha}_beta_{beta}",
                                "experiment_metrics.csv")
            ref = cell_stats(refp) if os.path.exists(refp) else {}
            row = [f"| {alpha} | {beta} "]
            memb = []
            for sp in ("X", "Z"):
                for i in (0, 1):
                    rv = ref.get(sp, (None, None, 0))[i] if ref else None
                    band = bands[(sp, i)]
                    m = in_band(rv, band)
                    memb.append(m)
                    row.append(f"| {fmt_band(band)} | "
                               f"{'—' if rv is None else f'{rv:.3g}'} | {m} ")
            row.append("|")
            lines.append("".join(row))
            n_cells += 1
            n_in += sum(1 for m in memb if m == "✓")
    lines.append("")
    lines.append(f"Band membership: {n_in}/{n_cells * 4} reference medians inside "
                 f"our {len(args.seeds)}-seed bands "
                 f"(4 stats per cell: X-KL, X-Lip, Z-KL, Z-Lip).")
    text = "\n".join(lines)
    print(text)
    if args.out:
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
