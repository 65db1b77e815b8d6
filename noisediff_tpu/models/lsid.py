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

from .blocks import _ConvParams, fold_width, unfold_width


def _he_fanout_conv(key, shape, dtype):
    # flax Conv kernel: (kh, kw, in, out); n = kh*kw*out (reference fan-out rule)
    kh, kw, _, out = shape
    std = math.sqrt(2.0 / (kh * kw * out))
    return jax.random.normal(key, shape, dtype) * std


class _ConvLrelu(nn.Module):
    """conv3x3 + LeakyReLU(0.2); fold > 1 runs width-folded (blocks.Conv
    transforms the kernel, parameters keep nn.Conv-compatible paths)."""

    features: int
    dtype: Optional[Any] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else (x,)
        in_features = sum(p.shape[-1] for p in parts) // self.fold
        x = _ConvParams(
            features=self.features, in_features=in_features, kernel_size=3,
            strides=1, padding="SAME", use_bias=True, dtype=self.dtype,
            fold=self.fold, kernel_init=_he_fanout_conv,
            bias_init=jax.nn.initializers.zeros, name="conv",
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
    # width-fold the narrow (C < 96) levels; see NoiseDiffNet.lane_fold.
    # None = auto (on for the TPU backend when the width allows it).
    lane_fold: Optional[bool] = None
    # level-1 channel width; levels scale (w, 2w, 4w, 8w, 16w). 32 is the
    # reference architecture (SID_arch.py:49-175, param count pinned);
    # smaller widths serve the bounded-budget closed-loop learning gate.
    base_width: int = 32

    @nn.compact
    def __call__(self, x):
        lane_fold = self.lane_fold
        if lane_fold is None:
            lane_fold = jax.default_backend() == "tpu"
        # levels 1/2 fold; their widths must stay even through two pools
        lane_fold = lane_fold and x.shape[2] % 4 == 0
        F = 2 if lane_fold else 1
        conv = partial(_ConvLrelu, dtype=self.dtype)
        w = self.base_width

        def up(features, name):
            return nn.ConvTranspose(
                features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False,
                kernel_init=_he_fanout_conv, dtype=self.dtype, name=name,
            )

        def pool_folded(x, f):
            # pool/fold boundaries are pure reshapes on the minor dims
            if f > 1:
                return fold_width(_maxpool_ceil(unfold_width(x, f)), f)
            return _maxpool_ceil(x)

        if F > 1:
            x = fold_width(x, F)
        x = conv(w, fold=F, name="conv1_1")(x)
        x = conv(w, fold=F, name="conv1_2")(x)
        c1 = x  # folded skip
        x = pool_folded(x, F)

        x = conv(2 * w, fold=F, name="conv2_1")(x)
        x = conv(2 * w, fold=F, name="conv2_2")(x)
        c2 = x
        x = _maxpool_ceil(unfold_width(x, F) if F > 1 else x)

        x = conv(4 * w, name="conv3_1")(x)
        x = conv(4 * w, name="conv3_2")(x)
        c3 = x
        x = _maxpool_ceil(x)

        x = conv(8 * w, name="conv4_1")(x)
        x = conv(8 * w, name="conv4_2")(x)
        c4 = x
        x = _maxpool_ceil(x)

        x = conv(16 * w, name="conv5_1")(x)
        x = conv(16 * w, name="conv5_2")(x)

        def merge(x, skip):
            # crop the upsampled map to the skip's spatial size (SID_arch.py:140)
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            return (x, skip)  # channel-concat as conv parts (blocks._ConvParams)

        x = merge(up(8 * w, "up6")(x), c4)
        x = conv(8 * w, name="conv6_1")(x)
        x = conv(8 * w, name="conv6_2")(x)

        x = merge(up(4 * w, "up7")(x), c3)
        x = conv(4 * w, name="conv7_1")(x)
        x = conv(4 * w, name="conv7_2")(x)

        def merge_folded(x, skip, f):
            # upsampled map arrives unfolded; skip is folded
            if f > 1:
                x = x[:, : skip.shape[1], : skip.shape[2] * f, :]
                return (fold_width(x, f), skip)
            return merge(x, skip)

        x = merge_folded(up(2 * w, "up8")(x), c2, F)
        x = conv(2 * w, fold=F, name="conv8_1")(x)
        x = conv(2 * w, fold=F, name="conv8_2")(x)

        x = unfold_width(x, F) if F > 1 else x
        x = merge_folded(up(w, "up9")(x), c1, F)
        x = conv(w, fold=F, name="conv9_1")(x)
        x = conv(w, fold=F, name="conv9_2")(x)

        y = _ConvParams(
            features=self.inchannel, in_features=w, kernel_size=1, strides=1,
            padding="SAME", use_bias=True, dtype=self.dtype, fold=F,
            kernel_init=_he_fanout_conv, bias_init=jax.nn.initializers.zeros,
            name="conv10",
        )(x)
        if F > 1:
            y = unfold_width(y, F)
        return y
