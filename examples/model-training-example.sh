#!/usr/bin/env bash
# Training + prediction walkthrough (mirrors the reference's
# examples/model-training-example.sh recipe: n_iter 5000, early stop).
set -euo pipefail

DATASET=${1:-dataset_root/dataset.json}
COLOR_MAP=${2:-dataset_root/masks/image_map.json}
MODEL_OUT=${3:-model_out}

python -m page_segmentation_tpu.cli train \
    --train "$DATASET" --test "$DATASET" --eval "$DATASET" \
    --output "$MODEL_OUT" \
    --n_iter 5000 \
    --early_stopping_max_performance_drops 30 \
    --data_augmentation \
    --compute_baseline \
    --color_map "$COLOR_MAP" \
    --dtype bfloat16

# predict with the trained model; writes color/ overlay/ inverted/
python -m page_segmentation_tpu.cli predict \
    --load "$MODEL_OUT/model" \
    --output "$MODEL_OUT/predictions" \
    --images dataset_root/images \
    --binary dataset_root/binary_images \
    --norm dataset_root/normalizations \
    --color_map "$COLOR_MAP"

# --- optional variants -------------------------------------------------
# throughput predict (batched fused device pipeline; a lone cc_majority
# post-processor fuses onto the device as a batched Pallas CC vote):
#   python -m page_segmentation_tpu.cli predict ... \
#       --fast --batch_size 48 --dtype bfloat16 --post_process cc_majority
#
# fine-tune from a keras-applications backbone (imagenet weights file):
#   python -m page_segmentation_tpu.cli train ... \
#       --architecture mobile_net --pretrained_encoder mobilenetv2.h5
#
# resume an interrupted run (optimizer state + LR + early-stop counters):
#   python -m page_segmentation_tpu.cli train ... \
#       --load "$MODEL_OUT/model" --continue_training
#   # or, with the orbax backend: --checkpoint_backend orbax --auto_resume
#
# multi-chip data parallelism: --n_devices 8 --batch_size 8
# multi-host (DCN):            --distributed  (one process per host, env:
#                              JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID)
#
# corpora that do not fit host RAM: --streaming keeps pixels on disk
# (shapes peeked from PNG headers; batches load in the prefetch thread)
#
# large effective batch at batch-1 HBM: --grad_accum 8
# divergence guard (skip NaN steps, abort after 5 consecutive):
#   --skip_nonfinite 5
# cosine LR schedule with warmup (supersedes the plateau reducer):
#   --lr_schedule cosine --lr_warmup_steps 200 --lr_min_fraction 0.05
