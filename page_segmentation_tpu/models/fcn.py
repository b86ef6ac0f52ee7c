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


class _ConvParams(nn.Module):
    """Declares exactly the parameters TFConv would (same names, shapes,
    initializers — so the param tree and PRNG draws are identical) and
    returns them instead of applying the conv.  Used by the s2d stem to
    run the same weights through the rewritten-layout convolution."""

    features: int
    kernel_size: tuple

    @nn.compact
    def __call__(self, in_features: int):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (kh, kw, in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _stem(x, n1: int, n2: int, dt, s2d: bool):
    """conv1 (5x5, relu) + conv2 (5x5, linear) — the full-resolution stem
    shared by fcn/fcn_skip.  ``s2d=True`` runs both convs in
    space-to-depth(4) layout (models/s2d.py): exact same parameters and
    arithmetic, reindexed so the MXU contraction is 144+ deep instead of
    25; falls back to the dense path when H/W are not multiples of 4."""
    from .s2d import s2d_stem, stem_applicable

    if s2d and stem_applicable(x.shape):
        k1, b1 = _ConvParams(n1, (5, 5), name="conv1")(x.shape[-1])
        k2, b2 = _ConvParams(n2, (5, 5), name="conv2")(n1)
        return s2d_stem(x, [(k1, b1, relu), (k2, b2, None)], block=4, dtype=dt)
    conv1 = TFConv(n1, (5, 5), activation=relu, name="conv1", dtype=dt)(x)
    return TFConv(n2, (5, 5), name="conv2", dtype=dt)(conv1)


class FCNSkip(nn.Module):
    """fcn_skip: the default architecture (reference model.py:45-92).

    ``s2d_stem=True`` enables the exact space-to-depth rewrite of the
    two full-resolution stem convs (models/s2d.py) — a TPU fast path
    gated by argmax equality in tests/test_s2d_stem.py."""

    n_classes: int
    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)
        conv2 = _stem(x, 20, 30, dt, self.s2d_stem)
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
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)
        conv2 = _stem(x, 20, 30, dt, self.s2d_stem)
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
