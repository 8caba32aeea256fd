#!/usr/bin/env bash
# Precomputed FID statistics (fid_stats_mscoco256_val.npz etc., reference
# train_icd_sd15_lora.py:380-384) + the pt_inception-2015-12-05 weights.
# Twin of reference training/stats/download_fid_files.sh.
# Consume with:
#   --fid_stats "$STATS_DIR/fid_stats_mscoco256_val.npz"
#   --inception_weights "$STATS_DIR/pt_inception-2015-12-05-6726825d.pth"
# (cli/train_icd.py eval cadence and cli/generate.py --calc_metrics;
# converted by models/convert.py convert_inception_weights).
set -euo pipefail
STATS_DIR="${STATS_DIR:-stats}"
mkdir -p "$STATS_DIR"
wget -c https://storage.yandexcloud.net/yandex-research/invertible-cd/fid-files.tar.gz
tar -xzf fid-files.tar.gz -C "$STATS_DIR/"
rm fid-files.tar.gz
ls "$STATS_DIR"/*.npz >/dev/null || { echo "extraction failed"; exit 1; }
echo "ok:"; ls "$STATS_DIR"
