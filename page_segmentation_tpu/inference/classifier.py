"""Network runtime: model build/load, jit cache, single & batched forward.

TPU-native counterpart of the reference ``Network`` class (network.py:18-260)
for the inference half: architecture selection + preprocessing
(network.py:45-57,252-255), checkpoint loading (network.py:76-107 — here
Orbax/msgpack native checkpoints or imported Keras .h5), and
``predict_single_data`` returning (logit, prob, pred) (network.py:248-260).

Design difference from the reference: instead of dynamic shapes inside the
graph, images are padded host-side to bucketed static shapes (ops/pad.py)
and the jitted forward is cached per bucket; logits are cropped back
exactly.  A batched entry point amortizes dispatch for throughput.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SingleData
from ..models.registry import Architecture
from ..ops.pad import bucket_shape, crop_to, pad_to
from .output import masks_on_device


class PixelClassifier:
    """Holds a flax model + params and serves cached-jit forward passes."""

    def __init__(
        self,
        n_classes: int,
        architecture: Architecture = Architecture.FCN_SKIP,
        model_path: Optional[str] = None,
        compute_dtype=jnp.float32,
        bucket_granularity: int = 1,
        seed: int = 0,
    ):
        self.architecture = architecture
        self.n_classes = n_classes
        self.compute_dtype = compute_dtype
        self.bucket_granularity = bucket_granularity
        self.module = architecture.model(n_classes, dtype=compute_dtype)
        self.preprocess, self.rgb = architecture.preprocess()
        self.params = None
        if model_path:
            self.load(model_path)
        else:
            self.init_params(seed)
        self._forward_cache = {}
        self._masks_cache = {}

    # ----------------------------------------------------------- params I/O
    def init_params(self, seed: int = 0) -> None:
        rng = jax.random.PRNGKey(seed)
        h = w = self.architecture.stride_factor * 2
        c = 3 if self.rgb else 1
        dummy = jnp.zeros((1, h, w, c), jnp.float32)
        self.params = self.module.init({"params": rng, "dropout": rng}, dummy)["params"]

    def load(self, path: str) -> None:
        path = str(path)
        if path.endswith(".h5"):
            from ..models.h5_import import load_keras_h5

            self.params, detected = load_keras_h5(path, self.architecture, self.n_classes)
            if detected is not None:
                self.architecture = detected
                self.module = self.architecture.model(self.n_classes, dtype=self.compute_dtype)
                self.preprocess, self.rgb = self.architecture.preprocess()
        else:
            from ..train.checkpoint import load_checkpoint

            self.params, meta = load_checkpoint(path)
            arch = meta.get("architecture")
            if arch:
                self.architecture = Architecture(arch)
                self.module = self.architecture.model(self.n_classes, dtype=self.compute_dtype)
                self.preprocess, self.rgb = self.architecture.preprocess()

    # -------------------------------------------------------------- forward
    def _forward_fn(self, batch_shape: Tuple[int, ...]):
        if batch_shape not in self._forward_cache:

            @partial(jax.jit)
            def forward(params, image):
                return self.module.apply({"params": params}, image)

            self._forward_cache[batch_shape] = forward
        return self._forward_cache[batch_shape]

    def _prepare_input(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Preprocess + pad one image to its bucket; returns NHWC float32."""
        from ..models.layers import gray_to_rgb as _  # noqa: F401  (device variant)

        if self.rgb and (image.ndim == 2 or image.shape[-1] != 3):
            image = np.concatenate([image[..., None]] * 3, axis=-1)
        arr = np.asarray(self.preprocess(np.asarray(image, dtype=np.float32)), dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        orig_hw = arr.shape[:2]
        target = bucket_shape(orig_hw, self.architecture.stride_factor, self.bucket_granularity)
        return pad_to(arr, target), orig_hw

    def predict_single_data(self, data: SingleData):
        """(logit, prob, pred) for one page (reference network.py:248-260)."""
        from scipy.special import softmax

        arr, orig_hw = self._prepare_input(data.image)
        forward = self._forward_fn((1,) + arr.shape)
        logits = forward(self.params, arr[None])
        logit = crop_to(np.asarray(logits[0]), orig_hw)
        prob = softmax(logit, -1)
        pred = np.argmax(logit, -1)
        return logit, prob, pred

    def predict_batch_masks(self, images: np.ndarray, binaries: np.ndarray, palette: np.ndarray):
        """Fused batched forward + argmax + color/overlay/inverted on device.

        images: (N, H, W) uint8 prepared pages, all one bucket shape.
        binaries: (N, H, W) uint8 (1 = ink).
        Returns device arrays (pred, color, overlay, inverted).
        """
        key = ("masks", images.shape)
        if key not in self._masks_cache:
            module = self.module
            preprocess_on_device = not self.rgb  # grayscale archs: x/255 fuses on device

            @jax.jit
            def fused(params, images_u8, binaries_u8, palette_u8):
                x = images_u8.astype(jnp.float32)[..., None]
                if preprocess_on_device:
                    x = x / 255.0
                logits = module.apply({"params": params}, x)
                return masks_on_device(logits, binaries_u8, palette_u8)

            self._masks_cache[key] = fused
        return self._masks_cache[key](self.params, images, binaries, palette)


def network_for_model(model_path: str, n_classes: int, **kwargs) -> PixelClassifier:
    """Convenience constructor mirroring reference
    ``Network("Predict", n_classes, model=path)`` (predictor.py:19-20)."""
    return PixelClassifier(n_classes=n_classes, model_path=os.path.abspath(model_path), **kwargs)
