"""Keras-parity building blocks as flax.linen modules.

The parity-critical piece is ``Conv2DTranspose`` with SAME padding: we store
the kernel in the Keras layout (kh, kw, out, in) and lower through
``lax.conv_transpose(..., transpose_kernel=True)``, which is numerically
identical to tf.keras.layers.Conv2DTranspose (verified against the
gradient-of-conv definition for k/s in {2,3,4,5}x{1,2}).

Reference counterparts: Conv2D/Conv2DTranspose/MaxPooling2D uses in
model.py:45-92 (fcn_skip), :206-234 (fcn), :151-203 (unet), :237-307
(res_unet); GraytoRgb in layers.py:32-43.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class TFConvTranspose(nn.Module):
    """tf.keras.layers.Conv2DTranspose(padding='same') equivalent.

    Kernel layout (kh, kw, features, in_features) — the Keras layout — so
    .h5 weight import is a straight copy.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    activation: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=3, out_axis=2),
            (kh, kw, self.features, in_features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = lax.conv_transpose(
            x.astype(dtype),
            kernel.astype(dtype),
            strides=self.strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


class TFConv(nn.Module):
    """tf.keras.layers.Conv2D(padding='same') equivalent (Keras HWIO kernel)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    activation: Optional[Callable] = None
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


def max_pool_same(x, window: Tuple[int, int] = (2, 2), strides: Tuple[int, int] = (2, 2)):
    """tf.keras.layers.MaxPooling2D(padding='same') equivalent."""
    return nn.max_pool(x, tuple(window), strides=tuple(strides), padding="SAME")


def upsample2x(x):
    """tf.keras.layers.UpSampling2D(size=(2,2)) equivalent (nearest repeat)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def gray_to_rgb(x):
    """Channel-replicate grayscale to RGB (reference layers.py:32-43 /
    util.py:4-9)."""
    if x.shape[-1] == 3:
        return x
    return jnp.concatenate([x, x, x], axis=-1)


class GrayToRgb(nn.Module):
    """Serializable gray->RGB layer (reference layers.py:32-43 registers
    ``GraytoRgb`` in the .h5 custom-object table, network.py:73,84)."""

    @nn.compact
    def __call__(self, x):
        return gray_to_rgb(x.astype(jnp.float32))


class Padding2D(nn.Module):
    """Pad H/W by a fixed amount at bottom/right (reference layers.py:4-29
    ``Padding2DTensor``).  Prefer ops/pad.py bucketing outside the graph;
    this exists for architectural parity with serialized reference models."""

    padding: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def relu(x):
    return jax.nn.relu(x)
