#!/bin/bash
# LID-VAE inverse-Lipschitz sweep — mirror of exp_lip_illidvae.sh.
python -m vae_song_tpu.parallel.sweep --model lidvae \
  --ils 0.0 0.1 0.2 0.3 0.4 \
  --betas 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 1.0 \
  --seeds 42 43 44 45 46 47 48 49 50 \
  --epochs 1000 \
  --output_root ./results/ablation_IL
