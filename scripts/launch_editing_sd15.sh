#!/usr/bin/env bash
# iCD-SD1.5 PieBench editing sweep (twin of launch_editing_iCD_sd1.5.sh).
set -euo pipefail
python cli/edit.py \
  --model sd15 \
  --benchmark "${BENCHMARK:-running/benchmarks/editing_pie_bench_140.csv}" \
  --image_root "${IMAGE_ROOT:-}" \
  --guidance_scale 19.0 --dynamic_guidance --tau 0.8 --tau2 0.8 \
  --cross_replace_steps 0.6 --self_replace_steps 0.4 \
  --teacher_checkpoint "${TEACHER:-}" \
  --reverse_lora "${REVERSE_LORA:-}" \
  --forward_lora "${FORWARD_LORA:-}" \
  --out "${OUT:-/tmp/icd_editing}"
