#!/usr/bin/env bash
# COCO-caption generation eval sweep (capability twin of reference
# running/sd1.5/launch_generation_iCD_sd1.5.sh with the COCO prompt set +
# CLIP/ImageReward scoring, reference running/sd1.5/generate.py:404-425).
# Defaults to the vendored 600-row COCO-style stand-in
# (benchmarks/generation_coco_standin.csv — tools/make_benchmark_standin.py);
# point BENCHMARK at the real generation_coco.csv (8817 captions) when the
# reference assets are available. Scorer weights are optional: without
# them the sweep still runs and metrics report null (weight-gated).
set -euo pipefail
python cli/generate.py \
  --model "${MODEL:-sd15}" \
  --benchmark "${BENCHMARK:-benchmarks/generation_coco_standin.csv}" \
  --max_cnt "${MAX_CNT:-600}" \
  --batch_size "${BATCH:-8}" \
  --guidance_scale 19.0 --tau1 0.8 --tau2 0.8 \
  --reverse_timesteps 259 519 779 999 \
  --forward_timesteps 19 259 519 779 \
  --teacher_checkpoint "${TEACHER:-}" \
  --reverse_lora "${REVERSE_LORA:-}" \
  --calc_metrics \
  --clip_vision_weights "${CLIP_VISION:-}" \
  --clip_text_scorer_weights "${CLIP_TEXT:-}" \
  --image_reward_weights "${IMAGE_REWARD:-}" \
  --bert_vocab "${BERT_VOCAB:-}" \
  --seed 150 \
  --out "${OUT:-/tmp/icd_generation_coco}"
