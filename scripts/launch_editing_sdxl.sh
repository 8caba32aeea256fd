#!/usr/bin/env bash
# iCD-SDXL editing sweep (twin of running/sdxl/launch_editing_iCD_sdxl.sh):
# forward-CD inversion at guidance 0 + dynamic-guidance sampling with
# amplify_prompt context swap, tau 0.7, CFG 19.
set -euo pipefail
python cli/edit.py \
  --model sdxl \
  --benchmark "${BENCHMARK:-running/benchmarks/editing_pie_bench_140.csv}" \
  --image_root "${IMAGE_ROOT:-}" \
  --guidance_scale 19.0 --tau 0.7 \
  --reverse_timesteps 249 499 699 999 \
  --forward_timesteps 19 249 499 699 \
  --teacher_checkpoint "${TEACHER:-}" \
  --reverse_lora "${REVERSE_LORA:-}" \
  --forward_lora "${FORWARD_LORA:-}" \
  --out "${OUT:-/tmp/icd_sdxl_editing}"
