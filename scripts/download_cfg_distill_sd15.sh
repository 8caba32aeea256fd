#!/usr/bin/env bash
# Guidance-distilled SD1.5 teacher (the w-embedding UNet state dict the
# reference loads at utils/loading.py:46-58). Twin of reference
# training/pretrained/download_cfg_distill_sd15.sh.
# Consume with: --teacher_checkpoint "$PRETRAINED_DIR/sd15_cfg_distill.pt"
# (cli/generate.py / cli/edit.py / cli/train_icd.py — converted on load
# by models/convert.py convert_unet_from_diffusers). The real-weight
# parity gates (PARITY.md, tests/test_reference_parity.py +
# tools/record_reference.py) take the same path.
set -euo pipefail
PRETRAINED_DIR="${PRETRAINED_DIR:-pretrained}"
mkdir -p "$PRETRAINED_DIR"
wget -c https://storage.yandexcloud.net/yandex-research/invertible-cd/sd15_cfg_distill.pt.tar.gz
tar -xzf sd15_cfg_distill.pt.tar.gz -C "$PRETRAINED_DIR/"
rm sd15_cfg_distill.pt.tar.gz
ls "$PRETRAINED_DIR"/sd15_cfg_distill* >/dev/null || { echo "extraction failed"; exit 1; }
echo "ok: $(ls "$PRETRAINED_DIR"/sd15_cfg_distill*)"
