"""Residual U-Net (reference model.py:237-307) as flax.

Channel plan f = [32, 64, 128, 256, 512] (the reference doubles
[16,32,64,128,256]); pre-activation residual blocks with a 3x3 strided
shortcut conv; batch-norm is OFF (the reference's ``bn_act`` defaults
``batch_normailzation=False``), so blocks are relu->conv chains + add.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import TFConv, relu, upsample2x

FILTERS = [32, 64, 128, 256, 512]


class ResUNet(nn.Module):
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        dt = self.dtype
        x = image.astype(dt)

        def conv_block(x, features, name, strides=(1, 1)):
            return TFConv(features, (3, 3), strides=strides, name=name, dtype=dt)(relu(x))

        def residual_block(x, features, name, strides=(1, 1)):
            res = conv_block(x, features, f"{name}_c1", strides)
            res = conv_block(res, features, f"{name}_c2")
            shortcut = TFConv(features, (3, 3), strides=strides, name=f"{name}_sc", dtype=dt)(x)
            return shortcut + res

        def stem(x, features, name):
            conv = TFConv(features, (3, 3), name=f"{name}_c0", dtype=dt)(x)
            conv = conv_block(conv, features, f"{name}_c1")
            shortcut = TFConv(features, (1, 1), name=f"{name}_sc", dtype=dt)(x)
            return conv + shortcut

        f = FILTERS
        e1 = stem(x, f[0], "stem")
        e2 = residual_block(e1, f[1], "enc2", strides=(2, 2))
        e3 = residual_block(e2, f[2], "enc3", strides=(2, 2))
        e4 = residual_block(e3, f[3], "enc4", strides=(2, 2))
        e5 = residual_block(e4, f[4], "enc5", strides=(2, 2))

        b0 = conv_block(e5, f[4], "bridge1")
        b1 = conv_block(b0, f[4], "bridge2")

        d1 = residual_block(jnp.concatenate([upsample2x(b1), e4], axis=-1), f[4], "dec1")
        d2 = residual_block(jnp.concatenate([upsample2x(d1), e3], axis=-1), f[3], "dec2")
        d3 = residual_block(jnp.concatenate([upsample2x(d2), e2], axis=-1), f[2], "dec3")
        d4 = residual_block(jnp.concatenate([upsample2x(d3), e1], axis=-1), f[1], "dec4")

        logits = TFConv(self.n_classes, (1, 1), padding="VALID", name="logits", dtype=dt)(d4)
        return logits.astype(jnp.float32)
