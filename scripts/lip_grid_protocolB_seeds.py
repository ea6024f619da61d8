#!/usr/bin/env python
"""Protocol-B (default) or protocol-A Lipschitz/KL grid with 4-seed bands.

Re-runs the reference's 27 committed cells (alpha x beta grid of
res_share/vis_lip_kl_exp_scc, exp_lip_lrvae.sh protocol with the
2-component data visible in the committed train_distribution_2d.png)
for seeds 42-45, through the in-process sweep runner (one compiled
program reused across all 108 points). ~75 min/seed on one v5e chip.

Usage:
  python scripts/lip_grid_protocolB_seeds.py --output_root /root/lipgrid_r3 \
      [--seeds 42 43 44 45]

Summarize afterwards with scripts/lip_band_table.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 27 committed cells' grid (reference res_share/vis_lip_kl_exp_scc:
# alpha_<a>_beta_<b> directories)
ALPHAS = [0.0, 0.0001, 0.001, 0.01, 0.1, 0.2, 0.3, 0.4, 1.0]
BETAS = [0.1, 0.2, 1.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--seeds", nargs="+", type=int, default=[42, 43, 44, 45])
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--components", type=int, default=2,
                    help="training-mixture components: 2 = protocol B "
                         "(committed cells' data), 8 = protocol A "
                         "(documented sweep-script defaults)")
    args = ap.parse_args()

    from vae_song_tpu.parallel.sweep import run_sweep

    # resumable: a cell whose experiment_metrics.csv exists is done —
    # run the remaining cells one at a time (compiled programs are
    # cached in-process, so per-cell calls cost nothing extra)
    results = []
    for beta in BETAS:
        for alpha in ALPHAS:
            for seed in args.seeds:
                outdir = os.path.join(
                    args.output_root, f"alpha_{alpha}_beta_{beta}_seed_{seed}"
                )
                if os.path.exists(os.path.join(outdir, "experiment_metrics.csv")):
                    print(f"skip done cell: alpha={alpha} beta={beta} seed={seed}",
                          flush=True)
                    continue
                results += run_sweep(
                    model="lrvae",
                    alphas=(alpha,),
                    betas=(beta,),
                    seeds=(seed,),
                    epochs=args.epochs,
                    output_root=args.output_root,
                    extra_args=("--num_training_components",
                                str(args.components)),
                )
    with open(os.path.join(args.output_root, "sweep_summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    n_ok = sum(1 for r in results if r.get("ok"))
    print(f"done: {n_ok}/{len(results)} new points ok -> {args.output_root}")


if __name__ == "__main__":
    main()
