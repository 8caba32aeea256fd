#!/usr/bin/env bash
# NPI editing baseline (twin of running/sd1.5/launch_editing_NPI_sd1.5.sh):
# 50-step DDIM inversion + Negative-Prompt-Inversion (uncond := cond
# source embeddings) on the TEACHER model, CFG 8.0, crs=0.2/srs=0.5.
set -euo pipefail
python cli/edit.py \
  --model sd15 \
  --benchmark "${BENCHMARK:-running/benchmarks/editing_pie_bench_140.csv}" \
  --image_root "${IMAGE_ROOT:-}" \
  --baseline npi \
  --num_ddim_steps 50 \
  --guidance_scale 8.0 \
  --cross_replace_steps 0.2 --self_replace_steps 0.5 \
  --amplify 3 \
  --teacher_checkpoint "${TEACHER:-}" \
  --seed 30 \
  --out "${OUT:-/tmp/npi_editing}"
