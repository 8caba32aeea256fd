#!/usr/bin/env bash
# NTI editing baseline (twin of running/sd1.5/launch_editing_NTI_sd1.5.sh):
# 50-step DDIM inversion + Null-Text-Inversion per-step uncond optimisation
# on the TEACHER model, CFG 8.0, p2p controller at crs=0.4/srs=0.8.
set -euo pipefail
python cli/edit.py \
  --model sd15 \
  --benchmark "${BENCHMARK:-running/benchmarks/editing_pie_bench_140.csv}" \
  --image_root "${IMAGE_ROOT:-}" \
  --baseline nti \
  --num_ddim_steps 50 \
  --nti_guidance_scale 8.0 \
  --guidance_scale 8.0 \
  --cross_replace_steps 0.4 --self_replace_steps 0.8 \
  --amplify 3 \
  --uncond_cache "${UNCOND_CACHE:-/tmp/nti_uncond.pkl}" \
  --teacher_checkpoint "${TEACHER:-}" \
  --seed 30 \
  --out "${OUT:-/tmp/nti_editing}"
