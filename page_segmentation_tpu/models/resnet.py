"""ResNet50-encoder U-Net (flax).

Capability parity with reference model.py:320-365 (``res_net_fine_tuning``):
ResNet50 backbone with skips at conv1_relu / conv2_block3_out /
conv3_block4_out / conv4_block6_out / conv5_block3_out, a simple-conv
decoder (256/192/128/64/32 double blocks) over nearest 2x upsampling with
concat skips down to full resolution, 1x1 logits.

The encoder replicates keras-applications ResNet50 *exactly* (verified by
feature-map parity with imported weights, models/resnet_import.py):
asymmetric stem padding (ZeroPadding 3 + VALID 7x7/2; ZeroPadding 1 +
VALID 3x3/2 pool), biases on every conv, stride-2 on the 1x1 convs of the
first block of stages conv3-conv5.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import TFConv, relu, upsample2x


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    act: bool = True
    padding: str = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TFConv(self.features, self.kernel, strides=self.strides, use_bias=True,
                   padding=self.padding, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1.001e-5,
                         dtype=self.dtype, name="bn")(x)
        return relu(x) if self.act else x


class _Bottleneck(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.downsample:
            shortcut = _ConvBN(self.features * 4, (1, 1), self.strides, act=False,
                               dtype=self.dtype, name="shortcut")(x, train)
        h = _ConvBN(self.features, (1, 1), self.strides, dtype=self.dtype, name="c1")(x, train)
        h = _ConvBN(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="c2")(h, train)
        h = _ConvBN(self.features * 4, (1, 1), act=False, dtype=self.dtype, name="c3")(h, train)
        return relu(shortcut + h)


class ResNet50Encoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List:
        skips = []
        # keras conv1_pad: explicit 3-pixel pad + VALID 7x7 stride-2 conv
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        h = TFConv(64, (7, 7), strides=(2, 2), use_bias=True, padding="VALID",
                   name="stem_conv", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1.001e-5,
                         dtype=self.dtype, name="stem_bn")(h)
        h = relu(h)
        skips.append(h)  # conv1_relu (H/2)
        # keras pool1_pad: 1-pixel pad + VALID 3x3 stride-2 max pool
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        for stage, (features, blocks) in enumerate([(64, 3), (128, 4), (256, 6), (512, 3)]):
            for b in range(blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                h = _Bottleneck(features, strides, downsample=(b == 0), dtype=self.dtype,
                                name=f"stage{stage}_block{b}")(h, train)
            skips.append(h)  # conv{2..5}_block*_out
        return skips


class ResNet50Seg(nn.Module):
    """U-Net over ResNet50 (reference model.py:320-365)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        x = image.astype(self.dtype)

        def conv_block_simple(h, features, name):
            h = TFConv(features, (3, 3), name=name, dtype=self.dtype)(h)
            return relu(h)

        skips = ResNet50Encoder(dtype=self.dtype, name="encoder")(x, train)
        conv1, conv2, conv3, conv4, conv5 = skips

        h = conv_block_simple(conv5, 256, "b_1")
        h = jnp.concatenate([upsample2x(h), conv4], axis=-1)
        h = conv_block_simple(h, 256, "conv6_1")
        h = conv_block_simple(h, 256, "conv6_2")
        h = jnp.concatenate([upsample2x(h), conv3], axis=-1)
        h = conv_block_simple(h, 192, "conv7_1")
        h = conv_block_simple(h, 192, "conv7_2")
        h = jnp.concatenate([upsample2x(h), conv2], axis=-1)
        h = conv_block_simple(h, 128, "conv8_1")
        h = conv_block_simple(h, 128, "conv8_2")
        h = jnp.concatenate([upsample2x(h), conv1], axis=-1)
        h = conv_block_simple(h, 64, "conv9_1")
        h = conv_block_simple(h, 64, "conv9_2")
        h = jnp.concatenate([upsample2x(h), x], axis=-1)
        h = conv_block_simple(h, 32, "conv10_1")
        h = conv_block_simple(h, 32, "conv10_2")
        logits = TFConv(self.n_classes, (1, 1), padding="VALID", name="logits", dtype=self.dtype)(h)
        return logits.astype(jnp.float32)
