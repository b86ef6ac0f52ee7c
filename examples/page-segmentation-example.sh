#!/usr/bin/env bash
# Region segmentation from trained predictions: XY-cut rectangles (or
# morphological text contours with --text_contours), rendered region
# masks + PAGE-XML documents for downstream OCR tooling.
set -euo pipefail

PRED_DIR=${1:-out/color}     # predict's color/ output
COLOR_MAP=${2:-image_map.json}
CHAR_HEIGHT=${3:-30}
OUT=${4:-segmentation}

python -m page_segmentation_tpu.cli page-segmentation \
    --prediction "$PRED_DIR"/*.png \
    --output_dir "$OUT" \
    --xml_output_dir "$OUT/xml" \
    --char_height "$CHAR_HEIGHT" \
    --color_map "$COLOR_MAP"

# evaluate predictions against ground-truth masks
# python -m page_segmentation_tpu.cli evaluate \
#     --masks masks_dir --predictions "$PRED_DIR" --color_map "$COLOR_MAP"
