#!/bin/bash
# LR-VAE Lipschitz/KL sweep — mirror of the reference's exp_lip_lrvae.sh
# grid (alpha x beta x seed), running through the in-process sweep
# runner (one compiled program reused across all cells).
python -m vae_song_tpu.parallel.sweep --model lrvae \
  --alphas 0.0 0.1 0.2 0.3 0.4 \
  --betas 0.7 0.8 0.9 1.0 \
  --seeds 42 43 44 45 \
  --epochs 1000 \
  --output_root ./results/ablation_lrvae_linear
