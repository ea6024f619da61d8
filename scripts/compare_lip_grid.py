#!/usr/bin/env python
"""Per-cell comparison of the full reference-protocol Lipschitz grid.

Reads our sweep cells (written by `vae_song_tpu.parallel.sweep` /
`cli/lipschitz.py`: experiment_metrics.csv with rows
{alpha, space, cell_idx, kl_div, lipschitz}) and the reference's
committed cells (`res_share/vis_lip_kl_exp_scc/alpha_<a>_beta_<b>/
experiment_metrics.csv`, same schema), and prints a markdown table of
per-(alpha, beta) summary statistics: MEDIAN KL and median
decoder-Lipschitz over the 16x16 X-space grid and the 16x16 Z-space
grid (medians, not means — see cell_stats: means are dominated by the
near-empty boundary cells).

Caveat printed with the table: the reference repo does not record the
seed / data configuration that produced the committed cells, so the
comparison is of field-level statistics under the sweep script's
defaults (exp_lip_lrvae.sh), not point equality.

Usage:
  python scripts/compare_lip_grid.py --ours /tmp/lipgrid/cells \
      --ref /root/reference/res_share/vis_lip_kl_exp_scc
"""

import argparse
import csv
import math
import os


def cell_stats(csv_path):
    """-> {space: (median_kl, median_lips, n_occupied)}.

    Rows with the empty-cell sentinel (-5.0, lipschitz.py:60-64
    convention, kept by our cli/lipschitz.py) are excluded. Medians, not
    means: the occupied-cell KL field spans orders of magnitude and a
    single boundary cell dominates a mean."""
    acc = {}
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            space = row["space"]
            kl, lips = float(row["kl_div"]), float(row["lipschitz"])
            if not (math.isfinite(kl) and math.isfinite(lips)):
                continue
            if kl == -5.0 and lips == -5.0:  # empty-cell sentinel
                continue
            acc.setdefault(space, []).append((kl, lips))
    out = {}
    for sp, rows in acc.items():
        kls = sorted(k for k, _ in rows)
        ls = sorted(l for _, l in rows)
        n = len(rows)
        out[sp] = (kls[n // 2], ls[n // 2], n)
    return out


def fmt(v):
    return f"{v:.3g}" if v is not None else "—"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", required=True, help="sweep output root")
    ap.add_argument("--ref", default="/root/reference/res_share/vis_lip_kl_exp_scc")
    ap.add_argument("--seed", default="42")
    args = ap.parse_args()

    alphas = ["0.0", "0.0001", "0.001", "0.01", "0.1", "0.2", "0.3", "0.4", "1.0"]
    betas = ["0.1", "0.2", "1.0"]

    print("| α | β | X cells o/r | X-KL ours/ref | X-L ours/ref "
          "| Z cells o/r | Z-KL ours/ref | Z-L ours/ref |")
    print("|---|---|---|---|---|---|---|---|")
    for b in betas:
        for a in alphas:
            ours_csv = os.path.join(
                args.ours, f"alpha_{a}_beta_{b}_seed_{args.seed}",
                "experiment_metrics.csv",
            )
            ref_csv = os.path.join(
                args.ref, f"alpha_{a}_beta_{b}", "experiment_metrics.csv"
            )
            ours = cell_stats(ours_csv) if os.path.exists(ours_csv) else {}
            ref = cell_stats(ref_csv) if os.path.exists(ref_csv) else {}
            cols = [a, b]
            for sp in ("X", "Z"):
                o = ours.get(sp)
                r = ref.get(sp)
                cols.append(f"{o[2] if o else '—'}/{r[2] if r else '—'}")
                cols.append(f"{fmt(o[0]) if o else '—'} / {fmt(r[0]) if r else '—'}")
                cols.append(f"{fmt(o[1]) if o else '—'} / {fmt(r[1]) if r else '—'}")
            print("| " + " | ".join(cols) + " |")


if __name__ == "__main__":
    main()
