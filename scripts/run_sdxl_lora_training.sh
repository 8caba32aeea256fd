#!/usr/bin/env bash
# iCD-SDXL LoRA training (twin of training/sh_scripts/run_sdxl_lora.sh;
# hyperparameters in configs/train_sdxl_lora.json — endpoints 0,249,499,699 /
# forward 249,499,699,999, discrete w-grid 0..19, preserve coefs 1.5).
set -euo pipefail
python cli/train_icd.py \
  --config configs/train_sdxl_lora.json \
  --data_root "${DATA_ROOT:?set DATA_ROOT to the COCO-style image folder}" \
  --base_params "${TEACHER:?set TEACHER to the converted SDXL teacher checkpoint}" \
  --output_dir "${OUT:-/tmp/icd_sdxl_train}" \
  --batch_size "${BATCH:-8}" \
  --remat \
  --resume_from_checkpoint latest
