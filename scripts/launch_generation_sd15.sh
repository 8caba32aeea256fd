#!/usr/bin/env bash
# iCD-SD1.5 generation sweep (capability twin of reference
# running/sd1.5/launch_generation_iCD_sd1.5.sh). Multi-host TPU pods run
# the same command on every host; prompts stride by process index.
set -euo pipefail
python cli/generate.py \
  --model sd15 \
  --benchmark "${BENCHMARK:-running/benchmarks/generation_coco.csv}" \
  --max_cnt "${MAX_CNT:-128}" \
  --batch_size "${BATCH:-8}" \
  --guidance_scale 19.0 --tau1 0.8 --tau2 0.8 \
  --reverse_timesteps 259 519 779 999 \
  --forward_timesteps 19 259 519 779 \
  --teacher_checkpoint "${TEACHER:-}" \
  --reverse_lora "${REVERSE_LORA:-}" \
  --seed 150 \
  --out "${OUT:-/tmp/icd_generation}"
