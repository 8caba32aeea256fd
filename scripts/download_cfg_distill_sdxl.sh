#!/usr/bin/env bash
# Guidance-distilled SDXL teacher (reference utils/loading.py:100-108).
# Twin of reference training/pretrained/download_cfg_distill_sdxl.sh.
# Consume with: --model sdxl --teacher_checkpoint
#   "$PRETRAINED_DIR/sdxl_cfg_distill.pt" (convert_unet_from_diffusers
# handles the SDXL key layout; tests/test_reference_parity_sdxl.py is
# the matching real-weight gate).
set -euo pipefail
PRETRAINED_DIR="${PRETRAINED_DIR:-pretrained}"
mkdir -p "$PRETRAINED_DIR"
wget -c https://storage.yandexcloud.net/yandex-research/invertible-cd/sdxl_cfg_distill.pt.tar.gz
tar -xzf sdxl_cfg_distill.pt.tar.gz -C "$PRETRAINED_DIR/"
rm sdxl_cfg_distill.pt.tar.gz
ls "$PRETRAINED_DIR"/sdxl_cfg_distill* >/dev/null || { echo "extraction failed"; exit 1; }
echo "ok: $(ls "$PRETRAINED_DIR"/sdxl_cfg_distill*)"
