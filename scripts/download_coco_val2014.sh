#!/usr/bin/env bash
# COCO val2014 images (eval data: FID-5k reference set, inversion eval).
# Twin of reference training/data/download_coco_val2014.sh.
set -euo pipefail
DATA_DIR="${DATA_DIR:-data}"
mkdir -p "$DATA_DIR"
wget -c https://storage.yandexcloud.net/yandex-research/invertible-cd/val2014.tar.gz
tar -xzf val2014.tar.gz -C "$DATA_DIR/"
rm val2014.tar.gz
test -d "$DATA_DIR/val2014" || { echo "extraction failed"; exit 1; }
n=$(ls "$DATA_DIR/val2014" | wc -l)
echo "ok: $DATA_DIR/val2014 ($n files)"
