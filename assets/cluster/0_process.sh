#!/bin/bash
# AV2 raw -> .h5 preprocessing (TPU-VM/CPU host job).
# Mirrors reference assets/slurm/0_process.sh:17-35: one-time, CPU-only,
# train+val+test; ~24h with 64 procs and 256GB RAM on the full dataset.
set -euo pipefail
ARGO_DIR=${ARGO_DIR:-/data/av2}
OUTPUT_DIR=${OUTPUT_DIR:-/data/av2/preprocess/sensor}
MASK_DIR=${MASK_DIR:-$ARGO_DIR/3d_scene_flow}
NPROC=${NPROC:-64}

python dataprocess/extract_av2.py --nproc "$NPROC" --av2_type sensor \
    --data_mode train --argo_dir "$ARGO_DIR" --output_dir "$OUTPUT_DIR"

python dataprocess/extract_av2.py --nproc "$NPROC" --av2_type sensor \
    --data_mode val --argo_dir "$ARGO_DIR" --output_dir "$OUTPUT_DIR" \
    --mask_dir "$MASK_DIR"

python dataprocess/extract_av2.py --nproc "$NPROC" --av2_type sensor \
    --data_mode test --argo_dir "$ARGO_DIR" --output_dir "$OUTPUT_DIR" \
    --mask_dir "$MASK_DIR"
