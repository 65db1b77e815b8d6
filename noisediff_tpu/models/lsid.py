"""LSID — the Learning-to-See-in-the-Dark 5-level UNet denoiser.

Structural parity target: reference `models/archs/SID_arch.py:49-175`.
4ch in/out, conv-conv-LeakyReLU(0.2) encoder (32..512) with ceil-mode 2x2
maxpool, ConvTranspose2d(k=2, s=2, bias=False) decoder with skip concats,
1x1 output head. He-normal init with n = k*k*out_channels (fan-out), zero
bias — matching SID_arch.py:96-103.

Reference param count: 7,760,004 (pinned in tests/test_models.py).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _he_fanout_conv(key, shape, dtype):
    # flax Conv kernel: (kh, kw, in, out); n = kh*kw*out (reference fan-out rule)
    kh, kw, _, out = shape
    std = math.sqrt(2.0 / (kh * kw * out))
    return jax.random.normal(key, shape, dtype) * std


class _ConvLrelu(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), padding="SAME",
            kernel_init=_he_fanout_conv, bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype, name="conv",
        )(x)
        return jax.nn.leaky_relu(x, negative_slope=0.2)


def _maxpool_ceil(x):
    # torch MaxPool2d(2, 2, ceil_mode=True) == SAME-padded 2x2/2 max pool:
    # for odd dims the trailing window covers just the last row/col.
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


class LSID(nn.Module):
    inchannel: int = 4
    block_size: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        conv = partial(_ConvLrelu, dtype=self.dtype)

        def up(features, name):
            return nn.ConvTranspose(
                features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False,
                kernel_init=_he_fanout_conv, dtype=self.dtype, name=name,
            )

        x = conv(32, name="conv1_1")(x)
        x = conv(32, name="conv1_2")(x)
        c1 = x
        x = _maxpool_ceil(x)

        x = conv(64, name="conv2_1")(x)
        x = conv(64, name="conv2_2")(x)
        c2 = x
        x = _maxpool_ceil(x)

        x = conv(128, name="conv3_1")(x)
        x = conv(128, name="conv3_2")(x)
        c3 = x
        x = _maxpool_ceil(x)

        x = conv(256, name="conv4_1")(x)
        x = conv(256, name="conv4_2")(x)
        c4 = x
        x = _maxpool_ceil(x)

        x = conv(512, name="conv5_1")(x)
        x = conv(512, name="conv5_2")(x)

        def merge(x, skip):
            # crop the upsampled map to the skip's spatial size (SID_arch.py:140)
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            return jnp.concatenate([x, skip], axis=-1)

        x = merge(up(256, "up6")(x), c4)
        x = conv(256, name="conv6_1")(x)
        x = conv(256, name="conv6_2")(x)

        x = merge(up(128, "up7")(x), c3)
        x = conv(128, name="conv7_1")(x)
        x = conv(128, name="conv7_2")(x)

        x = merge(up(64, "up8")(x), c2)
        x = conv(64, name="conv8_1")(x)
        x = conv(64, name="conv8_2")(x)

        x = merge(up(32, "up9")(x), c1)
        x = conv(32, name="conv9_1")(x)
        x = conv(32, name="conv9_2")(x)

        return nn.Conv(
            self.inchannel, (1, 1),
            kernel_init=_he_fanout_conv, bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype, name="conv10",
        )(x)
