#!/usr/bin/env bash
# iCD-SD1.5 LoRA training (twin of training/sh_scripts/run_sd15_lora.sh;
# hyperparameters from configs/train_sd15_lora.json / training README).
set -euo pipefail
python cli/train_icd.py \
  --model sd15 \
  --data_root "${DATA_ROOT:?set DATA_ROOT to the COCO-style image folder}" \
  --base_params "${TEACHER:?set TEACHER to the converted teacher checkpoint}" \
  --output_dir "${OUT:-/tmp/icd_train}" \
  --batch_size "${BATCH:-512}" \
  --max_steps 6000 --learning_rate 8e-6 \
  --loss_type huber --lora_rank 64 \
  --endpoints "0,259,519,779" --forward_endpoints "259,519,779,999" \
  --forward_preserve_coef 1.5 --reverse_preserve_coef 1.5 \
  --discrete_w "0,7,11,15,19" \
  --checkpointing_steps 500 --checkpoints_total_limit 5
