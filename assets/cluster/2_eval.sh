#!/bin/bash
# Evaluation (reference assets/slurm/2_eval.sh: 1 device, <=1h AV2 val).
set -euo pipefail
DATA=${DATA:-/data/av2/preprocess/sensor}
CKPT=${CKPT:?path to orbax dir or torch .ckpt}

python eval.py checkpoint="$CKPT" dataset_path="$DATA" av2_mode=val num_devices=1
# leaderboard submission:
# python eval.py checkpoint="$CKPT" dataset_path="$DATA" av2_mode=test leaderboard_version=2
