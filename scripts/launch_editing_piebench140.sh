#!/usr/bin/env bash
# PieBench-140 stand-in editing sweep (VERDICT r3 item 4; C30).
# Launch twin of the reference's launch_editing_iCD_sd1.5.sh run against
# running/benchmarks/instructions/editing_pie_bench_140.csv — here the
# 140-row stand-in CSV + pipeline-generated source images from
# tools/make_benchmark_standin.py (the real PieBench assets cannot enter
# this zero-egress container).
#
#   MODEL=tiny ./scripts/launch_editing_piebench140.sh   # CPU protocol check
#   MODEL=sd15 ./scripts/launch_editing_piebench140.sh   # on-chip full shapes
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL="${MODEL:-sd15}"
OUT="${OUT:-/tmp/piebench140_${MODEL}}"
CSV="benchmarks/piebench140_standin.csv"
IMAGES="benchmarks/piebench140_images_${MODEL}"

python tools/make_benchmark_standin.py --model "$MODEL" \
    --csv "$CSV" --image_root "$IMAGES"

# Reference protocol flags (launch_editing_iCD_sd1.5.sh): guidance 19,
# dynamic guidance tau 0.8, cross/self replace 0.6/0.4, metrics JSON.
python cli/edit.py \
    --model "$MODEL" \
    $([ "$MODEL" = tiny ] && echo --platform cpu) \
    --benchmark "$CSV" \
    --image_root "$IMAGES" \
    --guidance_scale 19.0 --dynamic_guidance --tau 0.8 \
    --cross_replace_steps 0.6 --self_replace_steps 0.4 \
    --is_replacement --amplify 3 \
    --calc_metrics \
    --out "$OUT"

python - "$OUT" <<'EOF'
import json, sys
s = json.load(open(f"{sys.argv[1]}/results.json"))
n = len(s["results"])
assert n == 140, f"protocol incomplete: {n}/140 rows"
print(f"PieBench-140 stand-in protocol complete: {n} rows")
print("compiled executables:", s.get("compiled_executables"))
print("metrics:", s.get("metrics"))
EOF
