#!/usr/bin/env bash
# COCO train2014 images (training data). Twin of reference
# training/data/download_coco_train2014.sh — same published artifact.
# After extraction, point cli/train_icd.py at it:
#   --train_data_dir "$DATA_DIR/train2014" (images)
#   plus the captions CSV ({subset}.csv next to the folder, reference
#   training/src/datasets.py:46-110 / our data/dataset.py CocoDataset).
set -euo pipefail
DATA_DIR="${DATA_DIR:-data}"
mkdir -p "$DATA_DIR"
wget -c https://storage.yandexcloud.net/yandex-research/invertible-cd/train2014.tar.gz
tar -xzf train2014.tar.gz -C "$DATA_DIR/"
rm train2014.tar.gz
test -d "$DATA_DIR/train2014" || { echo "extraction failed"; exit 1; }
n=$(ls "$DATA_DIR/train2014" | wc -l)
echo "ok: $DATA_DIR/train2014 ($n files)"
