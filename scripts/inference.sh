#!/usr/bin/env bash
# Canonical benchmark recipe — the 6 test sets of the published DOVE tables
# (reference: /root/reference/inference.sh:3-75; quality targets in
# BASELINE.md). Run from the repo root with the released checkpoint at
# $MODEL_PATH and the test sets under $DATA_ROOT/<set>/{LQ-Video,GT}.
#
# Notes vs the reference recipe:
#   * eval GT dirs point at EACH set's own GT (the reference script passes
#     UDM10's GT for every set — an apparent copy-paste slip we don't keep);
#   * clipiqa needs DOVE_CLIP_WEIGHTS (local CLIP ViT-B/32 snapshot) and
#     lpips/dists need DOVE_LPIPS_WEIGHTS / DOVE_DISTS_WEIGHTS — metrics
#     missing their weights are skipped with a clear error;
#   * add --quantize int8 to every inference line for the int8 serving mode.

set -e

MODEL_PATH=${MODEL_PATH:-pretrained_models/DOVE}
DATA_ROOT=${DATA_ROOT:-datasets/test}
OUT_ROOT=${OUT_ROOT:-results/DOVE}
FULL_METRICS=${FULL_METRICS:-psnr,ssim,lpips,dists,clipiqa}
EXTRA=${EXTRA:-}

run_set () {
    local name=$1; shift
    local metrics=$1; shift
    python scripts/inference.py \
        --input_dir "$DATA_ROOT/$name/LQ-Video" \
        --model_path "$MODEL_PATH" \
        --output_path "$OUT_ROOT/$name" \
        --is_vae_st $EXTRA "$@"
    local gt_args=()
    if [ -d "$DATA_ROOT/$name/GT" ]; then
        gt_args=(--gt_dir "$DATA_ROOT/$name/GT")
    fi
    python scripts/eval_metrics.py \
        --pred_dir "$OUT_ROOT/$name" "${gt_args[@]}" \
        --metrics "$metrics" \
        --output "$OUT_ROOT/$name/metrics.json"
}

# synthetic-degradation sets (LQ is 4x downscaled)
run_set UDM10   "$FULL_METRICS"
run_set SPMCS   "$FULL_METRICS"
run_set YouHQ40 "$FULL_METRICS"

# real-world sets already at target resolution: no pre-upscale
run_set RealVSR "$FULL_METRICS" --upscale 1
run_set MVSR4x  "$FULL_METRICS" --upscale 1

# no-reference set
run_set VideoLQ clipiqa
