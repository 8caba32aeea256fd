#!/usr/bin/env bash
# iCD-SDXL generation sweep (twin of running/sdxl/launch_generation_iCD_sdxl.sh):
# 4-step reverse CD at 1024², static CFG 7.0 (reference use_dynamic_guidance
# False), parti-prompts benchmark.
set -euo pipefail
python cli/generate.py \
  --model sdxl \
  --benchmark "${BENCHMARK:-running/benchmarks/generation_parti-prompts.csv}" \
  --max_cnt "${MAX_CNT:-128}" \
  --batch_size "${BATCH:-8}" \
  --guidance_scale 7.0 --no-dynamic_guidance \
  --reverse_timesteps 249 499 699 999 \
  --forward_timesteps 19 249 499 699 \
  --teacher_checkpoint "${TEACHER:-}" \
  --reverse_lora "${REVERSE_LORA:-}" \
  --seed 150 \
  --out "${OUT:-/tmp/icd_sdxl_generation}"
