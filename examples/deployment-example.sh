#!/usr/bin/env bash
# Deployment flows: high-throughput batch prediction over a raw corpus,
# a long-lived HTTP service with dynamic batching, the int8-quantized
# variant of either, and the self-contained AOT artifact.
#
# Inputs mirror the predict example: a trained checkpoint (or a
# reference-era Keras .h5 — both load), raw page images + their
# binarizations, and one line height (or per-page --norm JSONs).
set -euo pipefail

MODEL=${1:-model_out/model}   # checkpoint dir or legacy .h5
IMAGES=${2:-images}
BINARY=${3:-binary_images}
CHAR_HEIGHT=${4:-30}
OUT=${5:-deploy_out}

# 1. Raw-corpus streaming: the fused throughput pipeline as a CLI
#    feature.  Pages are grouped by (shape, line height); decode and
#    box-decimation on host, normalize/forward/argmax fused on device,
#    one uint8 upload + one packed download per batch, 3-stage overlap.
#    (~180 pages/s/chip on the bench config; docs/PERFORMANCE.md.)
python -m page_segmentation_tpu.cli predict \
    --load "$MODEL" --output "$OUT/batch" \
    --images "$IMAGES" --binary "$BINARY" --char_height "$CHAR_HEIGHT" \
    --pipeline --batch_size 16 --dtype bfloat16

# 2. The same corpus through the int8-quantized program (calibrated on
#    the first batch; checkpoints unchanged).  On the FCN channel plan
#    this measures ~1.1x slower than bf16 (see models/quant.py) — shown
#    here because the flag matters for wide-channel custom models and
#    HBM-constrained serving.
python -m page_segmentation_tpu.cli predict \
    --load "$MODEL" --output "$OUT/batch_int8" \
    --images "$IMAGES" --binary "$BINARY" --char_height "$CHAR_HEIGHT" \
    --pipeline --int8 --batch_size 16 --dtype bfloat16

# 3. Long-lived HTTP service: concurrent POST /predict requests are
#    dynamically batched into shared fused dispatches.
python -m page_segmentation_tpu.cli serve \
    --load "$MODEL" --port 8765 --char_height "$CHAR_HEIGHT" \
    --max_batch 16 --max_wait_ms 25 &
SERVER_PID=$!
sleep 5
curl -s "localhost:8765/healthz"
FIRST_IMAGE=$(ls "$IMAGES" | head -1)
curl -s -X POST --data-binary @"$IMAGES/$FIRST_IMAGE" \
    "localhost:8765/predict?output=color&char_height=$CHAR_HEIGHT" \
    > "$OUT/served_mask.png"
curl -s "localhost:8765/stats"
kill "$SERVER_PID"

# 4. AOT artifact: the compiled predict program, weights baked in, one
#    file loadable with jax alone (no flax/model code/checkpoint) —
#    lowered for TPU and CPU, symbolic shapes cover every page size.
python -m page_segmentation_tpu.cli export \
    --load "$MODEL" --output "$OUT/model.psx"
python - "$OUT/model.psx" <<'EOF'
import sys
from page_segmentation_tpu.inference.aot import AotClassifier
clf = AotClassifier(sys.argv[1])
print("AOT artifact loads:", clf.manifest["architecture"], clf.n_classes, "classes")
EOF

# --- giant pages & overload -------------------------------------------
# single-chip giant pages, bounded HBM (sequential row bands + halos):
#   python -m page_segmentation_tpu.cli predict ... --band_rows 4096
# multi-chip giant pages (row bands across a mesh): --n_devices 4
# serving backpressure (reject beyond 64 pending with 503 + Retry-After):
#   python -m page_segmentation_tpu.cli serve ... --max_queue 64
# prepared-dataset streaming predict (O(batch) host memory):
#   python -m page_segmentation_tpu.cli predict ... --streaming
