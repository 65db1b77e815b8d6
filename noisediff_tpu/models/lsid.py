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

from .blocks import _ConvParams, fold_width, packed_narrow_conv, unfold_width


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
        # leaky_relu(x, 0.2) == max(x, 0.2x) exactly (slope in (0,1)); the
        # max form fuses into the conv epilogue where jnp.where's select_n
        # was profiled as separate full-res passes (+ relayout copies)
        return jnp.maximum(x, 0.2 * x)


def _maxpool_ceil(x):
    # torch MaxPool2d(2, 2, ceil_mode=True) == SAME-padded 2x2/2 max pool:
    # for odd dims the trailing window covers just the last row/col.
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def _pool_fold_halving(x, f):
    """2x2/2 ceil-mode max pool on a fold-f tensor -> the fold-f/2 map.

    The unfold -> pool -> fold round trip leaves the pool itself in the
    unfolded NHWC shape whose narrow channel dim mismatches the
    neighbouring folded convs' layouts — profiled on the full-frame LSID as
    ~1 ms of reduce_window + layout copies per level. Exact reassociation:
    max over a 2x2 window = max over rows, then max over the column pair —
    and a folded pixel holds f consecutive columns as channel groups, so
    the pool is a (2,1) SAME pool (full lane fill, ceil-mode rows) + an
    elementwise max of adjacent channel-group pairs. The f/2 surviving
    groups ARE the fold-f/2 layout of the W/2-wide pooled map: the fold
    level halves with no reshape at all (f=2 lands unfolded).
    """
    ph = nn.max_pool(x, (2, 1), strides=(2, 1), padding="SAME")
    c = x.shape[-1] // f
    pairs = [
        jnp.maximum(ph[..., i * c : (i + 1) * c], ph[..., (i + 1) * c : (i + 2) * c])
        for i in range(0, f, 2)
    ]
    return jnp.concatenate(pairs, axis=-1) if len(pairs) > 1 else pairs[0]


class _UpPhase(nn.Module):
    """ConvTranspose(kernel 2x2, stride 2, VALID, no bias) as two phase
    matmuls + a row-interleave reshape (reference SID_arch.py:129-137 uses
    torch ConvTranspose2d; XLA lowers the lax.conv_transpose lowering into
    a zero-dilated conv + select/copy chain, profiled ~3 ms at the LSID
    full-frame up9).

    For k=2, s=2 every output pixel has exactly ONE input tap:
        y[2i+di, 2j+dj] = x[i, j] @ kernel[1-di, 1-dj]
    (lax.conv_transpose applies the kernel spatially flipped; verified
    numerically against flax nn.ConvTranspose). The two dj phases are laid
    out as channel pairs — exactly the width-folded layout — so the folded
    output (fold_out=2 consumers: up8/up9) is produced directly and the
    unfolded one is a bitcast reshape away. The row interleave is a
    (b, h, 2, w, 2c) -> (b, 2h, w, 2c) reshape whose concat XLA fuses into
    the phase-matmul producers.

    Parameter tree matches nn.ConvTranspose ('kernel', (2, 2, in, out),
    no bias) so checkpoints and the torch importer (torch_import.py
    _CONV_TRANSPOSE_NAMES) are unaffected. `naive=True` keeps the
    nn.ConvTranspose lowering (parity tests)."""

    features: int
    dtype: Optional[Any] = None
    fold_out: int = 1
    naive: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kern = self.param(
            "kernel", _he_fanout_conv, (2, 2, cin, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.naive:
            y = jax.lax.conv_transpose(
                x, kern.astype(dtype), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return fold_width(y, self.fold_out) if self.fold_out > 1 else y
        k = kern[::-1, ::-1].astype(dtype)  # k[di, dj] = tap of phase (di, dj)
        fo = self.fold_out
        ys = []
        for di in range(2):
            kk = jnp.concatenate([k[di, 0], k[di, 1]], axis=-1)  # (cin, 2cout)
            z = jnp.einsum("bhwc,cf->bhwf", x, kk)
            if fo == 4:
                # input-col-parity-major, dj-minor channel groups == the
                # fold-4 column order of the 2w-wide output
                z = fold_width(z, 2)
            ys.append(z)
        y = jnp.stack(ys, axis=2)
        y = y.reshape(b, 2 * h, y.shape[3], y.shape[4])
        return y if fo > 1 else unfold_width(y, 2)


class _HeadParams(nn.Module):
    """conv10 parameters at the same tree paths as _ConvParams(name=...):
    <name>/{kernel,bias} with the LSID inits — for the packed-head apply."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _he_fanout_conv,
            (1, 1, self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", jax.nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


def _packed_head(x, kernel, bias, fold):
    """conv10 on a folded map as a P-pixel-packed STRIDED conv
    (blocks.packed_narrow_conv; kernel arrives HWIO (1, 1, cin, cout))."""
    return packed_narrow_conv(x, kernel[0, 0], bias, fold)


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
    # keep the reference nn.ConvTranspose / unfolded-pool lowerings instead
    # of the phase/folded reformulations (exact either way; parity tests)
    naive_resample: bool = False

    @nn.compact
    def __call__(self, x):
        lane_fold = self.lane_fold
        if lane_fold is None:
            lane_fold = jax.default_backend() == "tpu"
        # levels 1/2 fold; their widths must stay even through two pools
        lane_fold = lane_fold and x.shape[2] % 4 == 0
        F = 2 if lane_fold else 1
        # level-1/9 fold: 4 when the width allows it — at base_width 32 the
        # fold-2 map has 64 lanes (50% fill) and the conv emitter's
        # per-pixel floor holds it to ~23 TF/s hw; the fold-4 map fills all
        # 128 lanes and wins 1.42x despite 2x the padding FLOPs
        # (scripts/bench_fold4.py). The naive tier keeps the single fold.
        F1 = F
        if F > 1 and not self.naive_resample and x.shape[2] % 8 == 0:
            F1 = 4
        conv = partial(_ConvLrelu, dtype=self.dtype)
        w = self.base_width

        def up(features, name, fold_out=1):
            if self.naive_resample:
                return nn.ConvTranspose(
                    features, (2, 2), strides=(2, 2), padding="VALID",
                    use_bias=False, kernel_init=_he_fanout_conv,
                    dtype=self.dtype, name=name,
                )
            return _UpPhase(
                features, dtype=self.dtype, fold_out=fold_out, name=name
            )

        if F1 > 1:
            x = fold_width(x, F1)
        x = conv(w, fold=F1, name="conv1_1")(x)
        x = conv(w, fold=F1, name="conv1_2")(x)
        c1 = x  # fold-F1 skip
        # level-1 pool: fold F1 -> F1/2. With F1=4 the output IS the fold-2
        # map level 2 consumes — the whole encoder cascades fold 4 -> 2 -> 1
        # with zero reshape copies. With F1=2 (naive tier or W%8!=0) the
        # halving lands unfolded and is re-folded by a bitcast.
        if F1 > 1 and not self.naive_resample:
            x = _pool_fold_halving(x, F1)
            if F1 == 2:
                x = fold_width(x, 2)
        elif F1 > 1:
            x = fold_width(_maxpool_ceil(unfold_width(x, F1)), F1)
        else:
            x = _maxpool_ceil(x)

        x = conv(2 * w, fold=F, name="conv2_1")(x)
        x = conv(2 * w, fold=F, name="conv2_2")(x)
        c2 = x
        # 2->3 boundary: pool in the folded domain; the fold halving lands
        # exactly unfolded for the C>=4w levels
        if F > 1 and not self.naive_resample:
            x = _pool_fold_halving(x, F)
        elif F > 1:
            x = _maxpool_ceil(unfold_width(x, F))
        else:
            x = _maxpool_ceil(x)

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
            if f > 1:
                if not self.naive_resample:
                    # phase up (fold_out=f) already produced a folded map
                    return (x[:, : skip.shape[1], : skip.shape[2], :], skip)
                # naive up arrives unfolded; skip is folded
                x = x[:, : skip.shape[1], : skip.shape[2] * f, :]
                return (fold_width(x, f), skip)
            return merge(x, skip)

        x = merge_folded(up(2 * w, "up8", fold_out=F)(x), c2, F)
        x = conv(2 * w, fold=F, name="conv8_1")(x)
        x = conv(2 * w, fold=F, name="conv8_2")(x)

        x = unfold_width(x, F) if F > 1 else x
        x = merge_folded(up(w, "up9", fold_out=F1)(x), c1, F1)
        x = conv(w, fold=F1, name="conv9_1")(x)
        x = conv(w, fold=F1, name="conv9_2")(x)

        # conv10 head: the folded 1x1 conv to 4 channels writes a tile-padded
        # (.., fold*4)-lane output — profiled 1.85 ms (0.4 TF/s useful) on the
        # full frame. At inference scale, run it as a P-pixel-packed strided
        # conv (blocks.packed_narrow_conv) so every buffer stays densely
        # tiled. Gated off at training-crop sizes (the packed kernel's wgrad
        # re-tiles pathologically).
        packed = (
            F1 > 1
            and not self.naive_resample
            and x.shape[1] * x.shape[2] >= 2**17
            and x.shape[2] % 2 == 0
        )
        if packed:
            k10, b10 = _HeadParams(w, self.inchannel, name="conv10")()
            y = _packed_head(x, k10, b10, F1)
        else:
            y = _ConvParams(
                features=self.inchannel, in_features=w, kernel_size=1,
                strides=1, padding="SAME", use_bias=True, dtype=self.dtype,
                fold=F1, kernel_init=_he_fanout_conv,
                bias_init=jax.nn.initializers.zeros, name="conv10",
            )(x)
        if F1 > 1:
            y = unfold_width(y, F1)
        return y
