"""Training progress hooks & visual diagnostics.

Parity with reference callback.py: the embeddable ``TrainProgressCallback``
interface (:10-18) and per-batch/per-epoch wiring (:21-45), plus a
``ModelDiagnoser`` equivalent (:74-106) that writes Input/GT/Prediction/
Overlay images per epoch — to plain PNG directories + a scalars JSONL
(TensorBoard-free observability; the files are TB-importable if wanted).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from ..core.colors import ColorMap
from ..core.image_io import imsave


class TrainProgressCallback:
    """No-op interface for embedding GUIs (reference callback.py:10-18)."""

    def init(self, total_iters: int, early_stopping_iters: int) -> None:
        pass

    def update_loss(self, batch: int, loss: float, acc: float) -> None:
        pass

    def next_best(self, epoch: int, acc: float, n_best: int) -> None:
        pass


class ScalarLogger:
    """Append-only JSONL scalar log: one record per step/epoch."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "scalars.jsonl")
        self._f = open(self.path, "a")

    def log(self, **record) -> None:
        record.setdefault("time", time.time())
        self._f.write(json.dumps({k: _to_py(v) for k, v in record.items()}) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def _to_py(v):
    if isinstance(v, (np.generic, np.ndarray)):
        return np.asarray(v).item() if np.ndim(v) == 0 else np.asarray(v).tolist()
    return v


class TensorboardWriter:
    """Optional TensorBoard image/scalar writer (reference callback.py:48-71).

    Uses tf.summary when TensorFlow is importable; otherwise falls back to
    the PNG/JSONL outputs (ScalarLogger + ModelDiagnoser) silently — TF is
    not a dependency of this framework.
    """

    def __init__(self, outdir: str, max_outputs: int = 10):
        os.makedirs(outdir, exist_ok=True)
        self.outdir = outdir
        self.max_outputs = max_outputs
        self.counter = 0
        try:
            import tensorflow as tf  # optional

            self._tf = tf
            self._writer = tf.summary.create_file_writer(outdir, flush_millis=10000)
        except Exception:
            self._tf = None
            self._writer = None

    def save_image(self, tag: str, image: np.ndarray, global_step: Optional[int] = None) -> None:
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.image(
                    tag, image, step=self.counter, max_outputs=self.max_outputs
                )
        else:
            arr = np.asarray(image)
            if arr.ndim == 4:
                arr = arr[0]
            imsave(os.path.join(self.outdir, tag.replace("/", "_") + f"-{self.counter}.png"),
                   np.clip(arr, 0, 255).astype(np.uint8))
        self.counter += 1

    def save_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(tag, value, step=step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class ModelDiagnoser:
    """Write Input / GT / Prediction / Overlay images per epoch
    (reference callback.py:84-106 semantics, PNG-backed)."""

    def __init__(self, output_dir: str, color_map: ColorMap, max_samples: int = 10):
        self.output_dir = output_dir
        self.color_map = color_map
        self.max_samples = max_samples
        os.makedirs(output_dir, exist_ok=True)

    def diagnose(self, epoch: int, samples) -> None:
        """samples: iterable of (image, binary, mask_labels, pred_labels)."""
        for index, (image, binary, mask, pred) in enumerate(samples):
            if index >= self.max_samples:
                break
            base = os.path.join(self.output_dir, f"{index}-{epoch}")
            image2d = image[..., 0] if image.ndim == 3 else image
            imsave(base + "-input.png", np.clip(image2d, 0, 255).astype(np.uint8))
            imsave(base + "-gt.png", self.color_map.to_rgb_array(mask))
            color_mask = self.color_map.to_rgb_array(pred)
            imsave(base + "-prediction.png", color_mask)
            overlay = color_mask.copy()
            inv_binary = np.stack([binary] * 3, axis=-1)
            overlay[inv_binary == 0] = 0
            imsave(base + "-overlay.png", overlay)
