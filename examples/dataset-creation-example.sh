#!/usr/bin/env bash
# End-to-end dataset creation walkthrough (mirrors the reference's
# examples/dataset-creation-example.sh flow on the TPU-native CLI).
#
# Inputs assumed:
#   $PAGES_DIR   - page images (grayscale or color scans)
#   $BINARY_DIR  - binarized versions (white background, black ink)
#   $XML_DIR     - PAGE-XML ground truth
set -euo pipefail

PAGES_DIR=${1:-pages}
BINARY_DIR=${2:-binary}
XML_DIR=${3:-xml}
OUT=${4:-dataset_root}

mkdir -p "$OUT"

# 1. rasterize PAGE-XML ground truth into color masks + the color map
python -m page_segmentation_tpu.cli gen-masks \
    --input_dir "$XML_DIR" \
    --output_dir "$OUT/masks" \
    --setting all_types

# 2. estimate per-page line heights (normalization files)
python -m page_segmentation_tpu.cli compute-image-normalizations \
    --input_dir "$PAGES_DIR" \
    --output_dir "$OUT/normalizations"

# 3. lay out the dataset directory
ln -sfn "$(realpath "$PAGES_DIR")" "$OUT/images"
ln -sfn "$(realpath "$BINARY_DIR")" "$OUT/binary_images"

# 4. split into train/test/eval dataset JSON
python -m page_segmentation_tpu.cli create-dataset-file \
    --dataset_path "$OUT" \
    --output_file "$OUT/dataset.json" \
    --n_train 0.8 --n_test 0.1 --n_eval 0.1

echo "dataset at $OUT/dataset.json, color map at $OUT/masks/image_map.json"
