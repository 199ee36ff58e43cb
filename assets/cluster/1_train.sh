#!/bin/bash
# Training on a TPU v5e-8 VM (replaces reference assets/slurm/1_train.sh's
# 8-GPU DDP node). One host drives all 8 chips through the single-process
# jax data mesh — no torchrun/srun rank plumbing needed.
set -euo pipefail
DATA=${DATA:-/data/av2/preprocess/sensor}

# leaderboard config (reference README.md:64-66)
python train.py model=deflow lr=2e-4 epochs=15 batch_size=16 \
    loss_fn=deflowLoss dataset_path="$DATA" wandb_mode=${WANDB_MODE:-offline}

# paper-setting runs (reference 1_train.sh:28-34)
# python train.py model=deflow lr=2e-6 epochs=50 batch_size=16 loss_fn=deflowLoss dataset_path="$DATA"
# python train.py model=fastflow3d lr=4e-5 epochs=20 batch_size=16 loss_fn=ff3dLoss dataset_path="$DATA"

# ablations (reference 1_train.sh:39-78)
# python train.py model=deflow "model.target.num_iters=2" dataset_path="$DATA"
# python train.py model=deflow "model.target.decoder_option=linear" dataset_path="$DATA"
# python train.py model=deflow "voxel_size=[0.1,0.1,6]" "model.target.grid_feature_size=[1024,1024]" dataset_path="$DATA"
