"""FCN encoder-decoder per-pixel classifiers (flax).

Capability parity with reference model.py: ``model_fcn_skip`` (:45-92) and
``model_fcn`` (:206-234) — exact channel plan 20/30/40/40/60/60/80, 5x5
convs, stride-2 2x2 transpose convs, skip concats.  Unlike the reference,
pad-to-stride-multiple happens *outside* the jitted model (ops/pad.py
bucketing) so shapes stay static for XLA.

Inputs: image (N, H, W, C) preprocessed float; H, W multiples of 8.
The reference models also take a binary input that no architecture uses
(network.py:57,89: ``input_2`` is wired but never consumed); we accept and
ignore it for API parity.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import TFConv, TFConvTranspose, max_pool_same, relu


class FCNSkip(nn.Module):
    """fcn_skip: the default architecture (reference model.py:45-92)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)
        conv1 = TFConv(20, (5, 5), activation=relu, name="conv1", dtype=dt)(x)
        conv2 = TFConv(30, (5, 5), name="conv2", dtype=dt)(conv1)
        pool2 = max_pool_same(conv2)
        conv3 = TFConv(40, (5, 5), activation=relu, name="conv3", dtype=dt)(pool2)
        conv4 = TFConv(40, (5, 5), name="conv4", dtype=dt)(conv3)
        pool4 = max_pool_same(conv4)
        conv5 = TFConv(60, (5, 5), activation=relu, name="conv5", dtype=dt)(pool4)
        conv6 = TFConv(60, (5, 5), name="conv6", dtype=dt)(conv5)
        pool6 = max_pool_same(conv6)
        conv7 = TFConv(80, (5, 5), activation=relu, name="conv7", dtype=dt)(pool6)

        deconv1 = TFConvTranspose(80, (5, 5), activation=relu, name="deconv1", dtype=dt)(conv7)
        deconv2 = TFConvTranspose(60, (2, 2), strides=(2, 2), activation=relu, name="deconv2", dtype=dt)(deconv1)
        deconv2 = jnp.concatenate([deconv2, conv6], axis=-1)
        deconv3 = TFConvTranspose(40, (5, 5), activation=relu, name="deconv3", dtype=dt)(deconv2)
        deconv3 = jnp.concatenate([deconv3, conv5], axis=-1)
        deconv4 = TFConvTranspose(30, (2, 2), strides=(2, 2), activation=relu, name="deconv4", dtype=dt)(deconv3)
        deconv4 = jnp.concatenate([deconv4, conv3], axis=-1)
        deconv5 = TFConvTranspose(20, (2, 2), strides=(2, 2), name="deconv5", dtype=dt)(deconv4)
        deconv5 = jnp.concatenate([deconv5, conv2], axis=-1)

        logits = TFConv(self.n_classes, (1, 1), name="logits", dtype=dt)(deconv5)
        return logits.astype(jnp.float32)


class FCN(nn.Module):
    """fcn: same encoder, decoder without skip concats
    (reference model.py:206-234)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)
        conv1 = TFConv(20, (5, 5), activation=relu, name="conv1", dtype=dt)(x)
        conv2 = TFConv(30, (5, 5), name="conv2", dtype=dt)(conv1)
        pool2 = max_pool_same(conv2)
        conv3 = TFConv(40, (5, 5), activation=relu, name="conv3", dtype=dt)(pool2)
        conv4 = TFConv(40, (5, 5), name="conv4", dtype=dt)(conv3)
        pool4 = max_pool_same(conv4)
        conv5 = TFConv(60, (5, 5), activation=relu, name="conv5", dtype=dt)(pool4)
        conv6 = TFConv(60, (5, 5), name="conv6", dtype=dt)(conv5)
        pool6 = max_pool_same(conv6)
        conv7 = TFConv(80, (5, 5), activation=relu, name="conv7", dtype=dt)(pool6)

        deconv1 = TFConvTranspose(80, (5, 5), activation=relu, name="deconv1", dtype=dt)(conv7)
        deconv2 = TFConvTranspose(60, (2, 2), strides=(2, 2), activation=relu, name="deconv2", dtype=dt)(deconv1)
        deconv3 = TFConvTranspose(40, (5, 5), activation=relu, name="deconv3", dtype=dt)(deconv2)
        deconv4 = TFConvTranspose(30, (2, 2), strides=(2, 2), activation=relu, name="deconv4", dtype=dt)(deconv3)
        deconv5 = TFConvTranspose(20, (2, 2), strides=(2, 2), name="deconv5", dtype=dt)(deconv4)

        logits = TFConv(self.n_classes, (1, 1), name="logits", dtype=dt)(deconv5)
        return logits.astype(jnp.float32)
