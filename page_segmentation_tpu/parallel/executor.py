"""Data-parallel predict executor over a device mesh.

The reference predicts one page at a time in a Python loop
(predictor.py:27-30).  At fleet scale the batch splits across chips: the
forward is shard_map'ed over the ``data`` axis (train/steps.make_forward_fn)
and each chip renders its shard's masks; outputs gather back
batch-ordered.  Collectives ride ICI — there is no host-side scatter
beyond the initial device_put.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..train.steps import make_forward_fn
from .mesh import shard_batch


class ParallelPredictor:
    """Batched data-parallel forward + on-device mask rendering."""

    def __init__(self, classifier, mesh: Mesh, data_axis: str = "data"):
        self.classifier = classifier
        self.mesh = mesh
        self.data_axis = data_axis
        self._forward = make_forward_fn(classifier.module, mesh, data_axis)

    def predict_batch(self, images: np.ndarray):
        """images: (N, H, W) uint8 prepared pages (one bucket shape), N a
        multiple of the mesh size.  Returns pred (N, H, W) int32 on host."""
        n_dev = self.mesh.devices.size
        n = images.shape[0]
        pad = (-n) % n_dev
        if pad:
            images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        if self.classifier.rgb and images.ndim == 3:
            pixels = np.stack([images] * 3, axis=-1).astype(np.float32)
        else:
            pixels = np.asarray(images, np.float32)
        x = np.asarray(self.classifier.preprocess(pixels), np.float32)
        if x.ndim == 3:
            x = x[..., None]
        sharded = shard_batch(self.mesh, {"x": x}, self.data_axis)["x"]
        logits = self._forward(self.classifier.variables, sharded)
        pred = jnp.argmax(logits, axis=-1)
        return np.asarray(pred)[:n]
