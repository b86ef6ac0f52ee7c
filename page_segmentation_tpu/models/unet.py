"""U-Net (reference model.py:151-203) as flax.

Channel plan 64/128/256/512/1024 double-convs, 2x2 max pools, dropout 0.5 on
the two deepest blocks, nearest 2x upsampling followed by a 2x2 'up-conv',
skip concats, final 1x1 logits conv.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import TFConv, max_pool_same, relu, upsample2x


class UNet(nn.Module):
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)

        def double_conv(x, features, name):
            x = TFConv(features, (3, 3), activation=relu, name=f"{name}a", dtype=dt)(x)
            return TFConv(features, (3, 3), activation=relu, name=f"{name}b", dtype=dt)(x)

        conv1 = double_conv(x, 64, "conv1")
        pool1 = max_pool_same(conv1)
        conv2 = double_conv(pool1, 128, "conv2")
        pool2 = max_pool_same(conv2)
        conv3 = double_conv(pool2, 256, "conv3")
        pool3 = max_pool_same(conv3)
        conv4 = double_conv(pool3, 512, "conv4")
        drop4 = nn.Dropout(0.5, deterministic=not train)(conv4)
        pool4 = max_pool_same(drop4)

        conv5 = double_conv(pool4, 1024, "conv5")
        drop5 = nn.Dropout(0.5, deterministic=not train)(conv5)

        up6 = TFConv(512, (2, 2), activation=relu, name="up6", dtype=dt)(upsample2x(drop5))
        conv6 = double_conv(jnp.concatenate([drop4, up6], axis=3), 512, "conv6")
        up7 = TFConv(256, (2, 2), activation=relu, name="up7", dtype=dt)(upsample2x(conv6))
        conv7 = double_conv(jnp.concatenate([conv3, up7], axis=3), 256, "conv7")
        up8 = TFConv(128, (2, 2), activation=relu, name="up8", dtype=dt)(upsample2x(conv7))
        conv8 = double_conv(jnp.concatenate([conv2, up8], axis=3), 128, "conv8")
        up9 = TFConv(64, (2, 2), activation=relu, name="up9", dtype=dt)(upsample2x(conv8))
        conv9 = double_conv(jnp.concatenate([conv1, up9], axis=3), 64, "conv9")

        logits = TFConv(self.n_classes, (1, 1), padding="VALID", name="logits", dtype=dt)(conv9)
        return logits.astype(jnp.float32)
