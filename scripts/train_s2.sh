#!/usr/bin/env bash
# DOVE stage-2 training (pixel-space composite loss), TPU-native.
# Mirrors the reference recipe /root/reference/finetune/train_ddp_one_s2.sh:
# starts from the exported stage-1 checkpoint, 2x320x640, lr 5e-6, 500 steps,
# image_ratio 0.8, DISTS weight 1.0 + frame_diff weight 1.0.
set -euo pipefail

MODEL_PATH="${MODEL_PATH:-train_results/s1_export}"
DATA_ROOT="${DATA_ROOT:-data}"
IMAGE_ROOT="${IMAGE_ROOT:-data/DIV2K}"
OUTPUT_DIR="${OUTPUT_DIR:-train_results/s2}"

python scripts/train.py \
    --model_path "$MODEL_PATH" \
    --model_name dove-s2 \
    --model_type real-sr-image-video \
    --training_type sft \
    --output_dir "$OUTPUT_DIR" \
    --data_root "$DATA_ROOT" \
    --video_column "$DATA_ROOT/HQ-VSR.txt" \
    --image_data_root "$IMAGE_ROOT" \
    --image_column "$IMAGE_ROOT/DIV2K.txt" \
    --degradation_config configs/degradation_image_video.yaml \
    --train_resolution 2x320x640 \
    --batch_size 1 \
    --train_epochs 1 \
    --train_steps 500 \
    --learning_rate 5e-6 \
    --lr_scheduler constant_with_warmup \
    --lr_warmup_steps 10 \
    --max_grad_norm 0.1 \
    --mixed_precision bf16 \
    --gradient_checkpointing true \
    --checkpointing_steps 100 \
    --sr_noise_step 399 \
    --noise_step 0 \
    --empty_prompt true --empty_ratio 1.0 \
    --image_ratio 0.8 \
    --use_perceptual_loss true \
    --dists_weight 1.0 \
    --frame_diff_weight 1.0 \
    "$@"
