#!/usr/bin/env bash
# DOVE stage-1 training (latent MSE), TPU-native.
# Mirrors the reference recipe /root/reference/finetune/train_ddp_one_s1.sh:
# CogVideoX1.5-5B base, 25x320x640, bs2, lr 2e-5, 10k steps, bf16,
# gradient checkpointing, max_grad_norm 0.1, sr_noise_step 399, noise_step 0,
# validation every 500 steps with 1 inference step.
# Parallelism: data-parallel over all chips; set --fsdp N to shard
# params/optimizer over an N-way "model" axis (ZeRO-3 analog).
set -euo pipefail

MODEL_PATH="${MODEL_PATH:-pretrained_models/CogVideoX1.5-5B}"
DATA_ROOT="${DATA_ROOT:-data}"
OUTPUT_DIR="${OUTPUT_DIR:-train_results/s1}"

python scripts/train.py \
    --model_path "$MODEL_PATH" \
    --model_name dove-s1 \
    --model_type real-sr \
    --training_type lora \
    --rank 128 --lora_alpha 64 \
    --output_dir "$OUTPUT_DIR" \
    --data_root "$DATA_ROOT" \
    --video_column "$DATA_ROOT/HQ-VSR.txt" \
    --degradation_config configs/degradation.yaml \
    --train_resolution 25x320x640 \
    --batch_size 2 \
    --train_epochs 10 \
    --train_steps 10000 \
    --learning_rate 2e-5 \
    --lr_scheduler constant_with_warmup \
    --lr_warmup_steps 100 \
    --max_grad_norm 0.1 \
    --mixed_precision bf16 \
    --gradient_checkpointing true \
    --checkpointing_steps 500 \
    --checkpointing_limit 10 \
    --sr_noise_step 399 \
    --noise_step 0 \
    --empty_prompt true --empty_ratio 1.0 \
    --do_validation true \
    --validation_steps 500 \
    --validation_dir "${VALIDATION_DIR:-$DATA_ROOT/UDM10/LQ}" \
    --validation_ref_videos "${VALIDATION_REF:-$DATA_ROOT/UDM10/GT}" \
    --num_inference_steps 1 \
    "$@"
