"""Shared Flax building blocks for the NoiseDiff model family.

Structural parity targets (reference `models/archs/Diffusion_arch.py`):
  Upsample/Downsample        :72-82    nearest-x2 + 3x3 conv / space-to-depth + 1x1
  RMSNorm                    :84-90    channelwise L2 norm * g * sqrt(C)
  SinusoidalPosEmb           :94-107
  RandomOrLearnedSinusoidalPosEmb :109-124
  Block / ResnetBlock        :128-170  conv-GN-FiLM-SiLU; time-FiLM resblock
  ResnetBlock2               :173-196  *spatial* per-pixel FiLM from pos-emb
  LinearAttention/Attention  :198-266
  LearnedSinusoidalPosEmb    :322-337  coord-map fourier features [x, sin, cos]
  Mlp                        :340-356  1x1-conv MLP
  CrossAttention/FeedForward/AttnBlock :361-443

Layout is NHWC (TPU-native) throughout; the reference is NCHW. Weight-import
from torch checkpoints transposes conv kernels OIHW->HWIO (train/torch_import.py).

Initialisation matches torch defaults at the distribution level so that
training from scratch behaves like the reference: Conv/Dense kernels and
biases ~ U(+-1/sqrt(fan_in)) (torch's kaiming_uniform(a=sqrt(5)) reduces to
exactly this bound), embeddings ~ N(0, 1).
"""
from __future__ import annotations

import contextlib
import functools
import math
import os
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torch-default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
torch_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _gelu(x):
    # torch nn.GELU() defaults to the exact erf formulation; keep it for
    # fp32. In bf16 the tanh approximation differs from exact GELU by less
    # than the output rounding (|err| < 3e-4 abs, bf16 eps ~ 4e-3 rel) and
    # the erf epilogue is VPU-bound on TPU (profiled ~1ms per full-res
    # FeedForward), so bf16 uses the approximation.
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def fold_width(x: jnp.ndarray, fold: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/fold, fold*C), channel order [beta*C + c].

    TPU memory layout motivation: bf16 tensors store the minor (channel)
    axis in 128-wide lane tiles, so C=48 wastes 62.5% of every HBM
    transaction and the conv emitter's per-pixel cost dominates. Folding
    width into channels (a pure reshape) runs the same math at C*fold with
    ~2.2x measured conv speedup at the NoiseDiffNet stage-1 shape."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // fold, fold * c)


def unfold_width(x: jnp.ndarray, fold: int = 2) -> jnp.ndarray:
    b, h, w2, cf = x.shape
    return x.reshape(b, h, w2 * fold, cf // fold)


def _fold_selector(kw: int, fold: int) -> "np.ndarray":
    """Constant selection tensor P (kw, kw_f, fold_in, fold_out) with
    P[q, dj, bin, bout] = 1 iff original tap q maps to folded block-column
    dj for input phase bin / output phase bout.

    Derivation (any fold): original input col fold*j + bin feeds output col
    fold*i + bout through tap q iff fold*(j - i) = q - p - bin + bout, so
    the folded column offset dj = (q - p - bin + bout) / fold whenever that
    is integral. SAME zero-padding in the folded domain lands on exactly
    the original out-of-range columns, so folded SAME == original SAME."""
    p = (kw - 1) // 2
    djs = [
        (q - p - bi + bo) // fold
        for q in range(kw)
        for bi in range(fold)
        for bo in range(fold)
        if (q - p - bi + bo) % fold == 0
    ]
    dj_min, dj_max = min(djs), max(djs)
    kw_f = dj_max - dj_min + 1
    assert dj_min == -(kw_f - 1) // 2 and kw_f % 2 == 1, (dj_min, kw_f)
    P = np.zeros((kw, kw_f, fold, fold), np.float32)
    for q in range(kw):
        for bi in range(fold):
            for bo in range(fold):
                num = q - p - bi + bo
                if num % fold == 0:
                    P[q, num // fold - dj_min, bi, bo] = 1.0
    return P


def _fold_conv_kernel(
    w: jnp.ndarray, in_segments: Sequence[int], fold: int
) -> jnp.ndarray:
    """Transform an HWIO conv kernel to operate on width-folded tensors.

    The folded input may be a channel-concat of `in_segments` folded
    tensors (skip connections): real input channel c of segment s with
    width Cs sits at folded position offset_s + beta*Cs + (c - start_s).
    Output (kh, kw', sum(fold*Cs), fold*Cout); SAME padding in the folded
    domain reproduces SAME padding in the original domain exactly (fold
    must divide W).

    Built as a dense einsum with a CONSTANT selection tensor — an
    .at[].set scatter formulation here makes XLA lower the conv into
    activation-sized masked selects (profiled ~1ms each)."""
    kh, kw, cin, cout = w.shape
    assert sum(in_segments) == cin, (in_segments, cin)
    assert kw % 2 == 1, "folded conv requires odd kernel width"
    P = jnp.asarray(_fold_selector(kw, fold))  # (kw, kw_f, fold, fold)
    parts = []
    start = 0
    for cs in in_segments:
        ws = w[:, :, start : start + cs, :]  # (kh, kw, cs, cout)
        # (kh, kw_f, fold_in, cs, fold_out, cout)
        wf = jnp.einsum("pqic,qdab->pdaibc", ws, P)
        parts.append(wf.reshape(kh, wf.shape[1], fold * cs, fold * cout))
        start += cs
    return jnp.concatenate(parts, axis=2)


def packed_narrow_conv(x, kernel, bias, fold):
    """1x1 conv with FEW output channels on a width-folded map, as a
    P-pixel-packed strided conv.

    x: (b, h, wf, fold*cin); kernel: (cin, cout) unfolded; returns the
    folded output (b, h, wf, fold*cout) as a bitcast reshape of the conv
    result. A direct folded conv's (.., fold*cout)-channel output pads
    fold*cout -> 128 lanes in HBM (~16x the logical write traffic at
    cout=4) and underfills the conv emitter. Packing P folded pixels per
    output position keeps every buffer densely tiled; expressing the
    packing as a (kh=1, kw=P, stride=P) conv whose tap p writes
    output-channel block p stays inside the conv emitter's layout world
    (a reshape-then-1x1 formulation measured ~1.7 ms of induced relayout
    copies at the LSID full frame — BENCH_NOTES). Caller gates on
    wf % 2 == 0."""
    b, h, wf, cf = x.shape
    cout = kernel.shape[-1]
    P = max(p for p in (16, 8, 4, 2) if wf % p == 0)
    kf = _fold_conv_kernel(kernel[None, None], (kernel.shape[0],), fold)[0, 0]
    co_f = fold * cout
    # taps (1, P, cf, P*co_f): tap p -> output channel block p (dense einsum
    # with a constant selector; an .at[].set scatter here would trigger
    # XLA's masked-select rewrite)
    eye = jnp.eye(P, dtype=kf.dtype)
    taps = jnp.einsum("pq,io->piqo", eye, kf).reshape(1, P, cf, P * co_f)
    y = jax.lax.conv_general_dilated(
        x, taps.astype(x.dtype), (1, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, P * fold).astype(x.dtype)
    return y.reshape(b, h, wf, co_f)


def _int8_enabled() -> bool:
    """Opt-in w8a8 quantized INFERENCE for the wide convs
    (NOISEDIFF_INT8=1). TPU v5e's MXU runs int8 at ~2x the bf16 rate
    (394 Tops/s vs 197 TFLOP/s peak; measured 332 Tops/s on a dense
    matmul, 1.38x end-to-end on the hot folded conv incl. the
    dequant/requant epilogue — scripts/bench_int8.py). Weights take
    per-output-channel symmetric scales, activations a dynamic per-tensor
    scale; accumulation is int32, dequant in f32, output cast back to the
    model dtype so the dtype contract is flag-independent.

    Inference-only: round/clip has zero gradient a.e., so the trainers
    refuse to start with this flag set. Quality is gated the same way the
    pipeline itself is — the learning-gate KLD protocol re-run with int8
    generation (BENCH_NOTES)."""
    return os.environ.get("NOISEDIFF_INT8", "0") == "1"


# convs with fewer unfolded in/out channels than this keep bf16: the 4/8
# channel heads and init_conv are bandwidth-bound (quantizing them saves
# nothing) and head precision matters most for sample statistics
_INT8_MIN_CHANNELS = 16


def _quantized_conv(x, kf, strides, pad, out_dtype):
    """w8a8 conv: x (NHWC, any float dtype), kf the (possibly folded) f32
    HWIO kernel. Returns the conv result in out_dtype."""
    sw = jnp.maximum(
        jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0, 1e-12
    )  # (cout,) per-output-channel symmetric weight scale
    kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    sx = jnp.maximum(
        jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12
    )  # dynamic per-tensor activation scale
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def _taps_wgrad_enabled() -> bool:
    """Whether stride-1 SAME convs compute their weight gradient as one
    tall-skinny matmul per kernel tap (kh*kw einsums of [B*H*W, Cin] x
    [B*H*W, Cout] over shifted activation slices) instead of XLA's
    wgrad-as-convolution lowering. In the whole-model train step XLA's
    wgrad re-tiles the activations into halo-padded [512,32,33,C] blocks
    with batch-minor layouts, spending more on layout copies and
    masked-select pads than on the MXU contraction (profiled: the two
    concat-input full-res blocks cost 16.5/14.8 ms of which <25% is
    MXU). The per-tap form needs no re-tiling: each tap is a plain
    f32-accumulated dot over the native NHWC layout. dgrad stays XLA's
    transposed convolution; for folded convs the fold-selector transpose
    is applied to the small folded kernel grad.

    MEASURED SLOWER on TPU v5e (2026-08-17): whole-model crop-512 train
    step 354 -> 412 ms (every full-res block regressed, e.g.
    ups_3_block2/block1 9.0 -> 16.1 ms) even though the isolated conv
    microbench wins 3% (scripts/bench_wgrad.py: 6.18 vs 6.38 ms). The 9
    shifted re-reads of each activation cost more HBM traffic than XLA's
    halo-re-tiling, and the custom_vjp boundary blocks wgrad/GN-chain
    fusion. Kept default-off as an exact, parity-tested alternative
    lowering (grad parity pinned at 6.7e-7 rel whole-model)."""
    return os.environ.get("NOISEDIFF_TAPS_WGRAD", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_same_taps(x, kernel, fold):
    """stride-1 SAME NHWC conv with reference (unfolded, HWIO) parameter
    `kernel`; fold > 1 means x is width-folded and the kernel is folded at
    apply time. Backward: per-tap einsum wgrad (see _taps_wgrad_enabled)."""
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold) if fold > 1 else kernel
    return jax.lax.conv_general_dilated(
        x, kf.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _cst_fwd(x, kernel, fold):
    return _conv_same_taps(x, kernel, fold), (x, kernel)


def _cst_bwd(fold, res, g):
    x, kernel = res
    cin = kernel.shape[2]
    kf = _fold_conv_kernel(kernel, (cin,), fold) if fold > 1 else kernel
    kh, kw = kf.shape[0], kf.shape[1]
    # dgrad: plain SAME conv of g with the spatially-reversed, IO-swapped
    # kernel (exact for odd kernels, stride 1, SAME)
    kt = jnp.flip(kf, (0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, kt.astype(g.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # wgrad: one [BHW, Cf] x [BHW, Cf] matmul per tap over shifted slices
    b, h, w, cf = x.shape
    if kh == 1 and kw == 1:
        dkf = jnp.einsum(
            "bhwi,bhwo->io", x, g, preferred_element_type=jnp.float32
        )[None, None]
    else:
        xp = jnp.pad(
            x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0))
        )
        rows = []
        for i in range(kh):
            row = []
            for j in range(kw):
                xs = jax.lax.slice(xp, (0, i, j, 0), (b, i + h, j + w, cf))
                row.append(
                    jnp.einsum(
                        "bhwi,bhwo->io", xs, g,
                        preferred_element_type=jnp.float32,
                    )
                )
            rows.append(jnp.stack(row, 0))
        dkf = jnp.stack(rows, 0)
    if fold > 1:
        _, vjpk = jax.vjp(lambda kk: _fold_conv_kernel(kk, (cin,), fold), kernel)
        (dk,) = vjpk(dkf.astype(kernel.dtype))
    else:
        dk = dkf.astype(kernel.dtype)
    return dx, dk


_conv_same_taps.defvjp(_cst_fwd, _cst_bwd)


def _wgrad_pallas_mode(x):
    """'' (off) | 'tpu' | 'interpret' — whether stride-1 SAME convs route
    their weight gradient through the streaming Pallas wgrad kernel
    (ops/pallas/conv_wgrad.py) instead of XLA's wgrad-as-convolution
    lowering (which re-tiles the folded full-res activations into
    halo-padded batch-minor blocks and rewrites the fold-selector einsum
    into activation-sized masked selects — BENCH_NOTES round-2/3 train
    profiles). The forward and dgrad stay exactly XLA's.

    NOISEDIFF_WGRAD=pallas forces it unconditionally on TPU (every
    stride-1 SAME conv with wide-enough channels, no area floor — the
    bench_wgrad A/B contract); =pallas-interpret forces interpret mode
    (CPU tests); =auto mirrors the GN kernels' gate — TPU + training
    trace + h*w >= NOISEDIFF_WGRAD_MIN_HW (default 4096; wgrad only
    exists under differentiation anyway); =xla / unset keeps XLA's
    lowering. OPT-IN until the crop-512 A/B on the real chip lands (the
    round-3 lesson: never default-on an unmeasured path).

    NOISEDIFF_WGRAD_MIN_HW only shapes the 'auto' heuristic — e.g.
    131072 restricts it to the crop-512 full-res stages
    (final_res_block / pos_block2 and the first down stage), the convs
    whose XLA wgrads the round-2/3 profiles flagged."""
    flag = os.environ.get("NOISEDIFF_WGRAD", "xla")
    min_hw = int(os.environ.get("NOISEDIFF_WGRAD_MIN_HW", "4096"))
    if flag == "pallas-interpret":
        return "interpret"
    if flag == "pallas" and jax.default_backend() == "tpu":
        return "tpu"
    if flag == "auto":
        if (
            _GN_TRAIN_TRACE[0]
            and jax.default_backend() == "tpu"
            and x.shape[1] * x.shape[2] >= min_hw
        ):
            return "tpu"
    return ""


def _wgrad_channels_ok(ci_f: int, co_f: int) -> bool:
    """Narrow-channel convs stay on XLA's wgrad: Mosaic pads the lane dim
    to 128, so a C=4 operand occupies 32x its logical VMEM (a pos_enc
    conv blew the 16M scoped-vmem limit), and tiny-channel tap dots
    underfill the MXU anyway. The hot blocks this kernel targets run
    folded 96x96."""
    return ci_f >= 32 and co_f >= 32


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_same_pallas_wgrad(x, kernel, fold, interpret):
    """stride-1 SAME NHWC conv with the reference (unfolded, HWIO)
    parameter `kernel`; fold > 1 means x is width-folded and the kernel is
    folded at apply time. Forward and dgrad are bit-identical to the plain
    path (same conv op; dgrad via jax.vjp of it); the weight gradient
    streams through ops/pallas/conv_wgrad (fp32 accumulation, one HBM read
    of x and g each)."""
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold) if fold > 1 else kernel
    return jax.lax.conv_general_dilated(
        x, kf.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _cpw_fwd(x, kernel, fold, interpret):
    return _conv_same_pallas_wgrad(x, kernel, fold, interpret), (x, kernel)


def _cpw_bwd(fold, interpret, res, g):
    from ..ops.pallas.conv_wgrad import conv_wgrad_dispatch as conv_wgrad

    x, kernel = res
    cin = kernel.shape[2]
    kf = _fold_conv_kernel(kernel, (cin,), fold) if fold > 1 else kernel

    def f(xx):
        return jax.lax.conv_general_dilated(
            xx, kf.astype(xx.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # dgrad: exactly XLA's transposed conv (the unused forward is DCE'd)
    _, vjp_x = jax.vjp(f, x)
    (dx,) = vjp_x(g)
    dkf = conv_wgrad(g, x, kf.shape[0], kf.shape[1], interpret == "interpret")
    if fold > 1:
        _, vjpk = jax.vjp(lambda kk: _fold_conv_kernel(kk, (cin,), fold), kernel)
        (dk,) = vjpk(dkf.astype(kernel.dtype))
    else:
        dk = dkf.astype(kernel.dtype)
    return dx, dk


_conv_same_pallas_wgrad.defvjp(_cpw_fwd, _cpw_bwd)


def _unfold_bwd_enabled() -> bool:
    """Whether folded SAME/stride-1 convs compute their backward in the
    UNFOLDED domain (exact: the width-fold is a bitcast reshape in NHWC
    row-major, so unfolded wgrad/dgrad are the true gradients of the
    reference kernel). This sidesteps two backward pathologies of the
    folded formulation: the fold selector's einsum transpose lowers the
    wgrad into activation-sized masked-select fusions, and the folded
    kernel's zero structure doubles the backward conv FLOPs.

    MEASURED SLOWER on TPU v5e (2026-08-17, BENCH_NOTES round-2 train
    section): whole-model crop-512 train step 2.92 -> 2.40 steps/s, and
    even the isolated 512x512x48 conv grad loses (6.30 folded-autodiff vs
    6.97 custom ms/eval — scripts/bench_wgrad.py): the unfold/fold
    round-trip of two activation-sized tensors costs more than the
    masked-select wgrads it avoids. Kept default-off as an exact,
    parity-tested lowering alternative for other runtimes/chips."""
    return os.environ.get("NOISEDIFF_UNFOLD_BWD", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _folded_conv_same(x, kernel, fold):
    """stride-1 SAME conv of a width-folded tensor with the reference
    (unfolded) HWIO kernel; backward runs in the unfolded domain."""
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold)
    return jax.lax.conv_general_dilated(
        x, kf.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fcs_fwd(x, kernel, fold):
    return _folded_conv_same(x, kernel, fold), (x, kernel)


def _fcs_bwd(fold, res, g):
    x, kernel = res
    xu = unfold_width(x, fold)
    gu = unfold_width(g, fold)

    def f(xx, k):
        return jax.lax.conv_general_dilated(
            xx, k.astype(xx.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(f, xu, kernel)
    dxu, dk = vjp(gu)
    return fold_width(dxu, fold), dk


_folded_conv_same.defvjp(_fcs_fwd, _fcs_bwd)


class _ConvParams(nn.Module):
    """Explicit conv parameter holder + apply. Parameter tree paths and
    initialisation match flax nn.Conv ('kernel' HWIO + 'bias'), so
    checkpoints and the torch importer are unaffected; unlike nn.Conv the
    parameter shape is set by `in_features`, independent of the (possibly
    width-folded) input tensor."""

    features: int
    in_features: int
    kernel_size: int
    strides: int
    padding: Any
    use_bias: bool
    dtype: Optional[Dtype]
    fold: int = 1
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        """x: a tensor, or a tuple of tensors treated as a channel concat —
        conv(concat(parts), w) == sum_i conv(part_i, w_i). Applying the sum
        form directly avoids both the concat copy and (folded) scattered
        multi-segment kernels, which XLA otherwise rewrites into
        activation-sized masked selects (profiled ~0.8ms each)."""
        ks = self.kernel_size
        fan_in = self.in_features * ks * ks
        kernel = self.param(
            "kernel", self.kernel_init or torch_kernel_init,
            (ks, ks, self.in_features, self.features), jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init or partial(torch_bias_init, fan_in=fan_in),
                (self.features,), jnp.float32,
            )
        parts = x if isinstance(x, (list, tuple)) else (x,)
        dtype = self.dtype or parts[0].dtype
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]

        same_s1 = self.strides == 1 and pad == "SAME"
        unfold_bwd = self.fold > 1 and same_s1 and _unfold_bwd_enabled()
        taps_bwd = same_s1 and ks % 2 == 1 and _taps_wgrad_enabled()
        # streaming Pallas wgrad (kh in {1,3} only — the kernel's row-carry
        # depth); forward/dgrad identical, so this is gradient-path-only.
        # Narrow-channel convs keep XLA on real TPU (lane padding + MXU
        # fill — interpret-mode tests still exercise the kernel at any C).
        wgrad_mode = (
            _wgrad_pallas_mode(parts[0])
            if same_s1 and ks in (1, 3) and not (unfold_bwd or taps_bwd)
            else ""
        )
        if wgrad_mode == "tpu" and not _wgrad_channels_ok(
            min(p.shape[-1] for p in parts), self.features * self.fold
        ):
            wgrad_mode = ""
        int8 = (
            _int8_enabled()
            and not (unfold_bwd or taps_bwd or wgrad_mode)
            and self.in_features >= _INT8_MIN_CHANNELS
            and self.features >= _INT8_MIN_CHANNELS
        )
        y = None
        start = 0
        for part in parts:
            cs = part.shape[-1] // self.fold
            k = kernel[:, :, start : start + cs, :]
            start += cs
            if unfold_bwd:
                yi = _folded_conv_same(part.astype(dtype), k, self.fold)
            elif taps_bwd:
                yi = _conv_same_taps(part.astype(dtype), k, self.fold)
            elif wgrad_mode:
                yi = _conv_same_pallas_wgrad(
                    part.astype(dtype), k, self.fold, wgrad_mode
                )
            else:
                if self.fold > 1:
                    k = _fold_conv_kernel(k, (cs,), self.fold)
                if int8:
                    yi = _quantized_conv(
                        part.astype(dtype), k,
                        (self.strides, self.strides), pad, dtype,
                    )
                else:
                    yi = jax.lax.conv_general_dilated(
                        part.astype(dtype), k.astype(dtype),
                        (self.strides, self.strides), pad,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
            y = yi if y is None else y + yi
        assert start == self.in_features, (start, self.in_features)
        if bias is not None:
            b = jnp.tile(bias, self.fold) if self.fold > 1 else bias
            y = y + b.astype(dtype)
        return y


class Conv(nn.Module):
    """2D conv with torch-default init, NHWC.

    fold > 1: the input (and output) tensors are width-folded
    (see fold_width); parameters keep their un-folded reference shapes and
    the kernel is transformed at apply time. in_segments gives the real
    channel widths of a folded-concat input (skip connections)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int | str = "SAME"
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    fold: int = 1
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else (x,)
        in_features = sum(p.shape[-1] for p in parts) // self.fold
        return _ConvParams(
            features=self.features,
            in_features=in_features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            fold=self.fold,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="conv",
        )(x)


class _DenseParams(nn.Module):
    """Explicit nn.Dense-compatible params ('kernel', 'bias'); fold > 1
    applies the kernel block-diagonally per folded pixel."""

    features: int
    in_features: int
    use_bias: bool
    dtype: Optional[Dtype]
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", torch_kernel_init,
            (self.in_features, self.features), jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", partial(torch_bias_init, fan_in=self.in_features),
                (self.features,), jnp.float32,
            )
        dtype = self.dtype or x.dtype
        if self.fold > 1 and x.ndim == 4:
            # folded 4-D path: run as a folded 1x1 conv — a block-diagonal
            # dense kernel gets rewritten by XLA into activation-sized
            # masked selects (profiled ~0.8ms each), the conv path doesn't
            wgrad_mode = _wgrad_pallas_mode(x)
            if wgrad_mode == "tpu" and not _wgrad_channels_ok(
                x.shape[-1], self.features * self.fold
            ):
                wgrad_mode = ""
            if _unfold_bwd_enabled():
                y = _folded_conv_same(
                    x.astype(dtype), kernel[None, None], self.fold
                )
            elif _taps_wgrad_enabled():
                y = _conv_same_taps(
                    x.astype(dtype), kernel[None, None], self.fold
                )
            elif wgrad_mode:
                y = _conv_same_pallas_wgrad(
                    x.astype(dtype), kernel[None, None], self.fold, wgrad_mode
                )
            else:
                k = _fold_conv_kernel(
                    kernel[None, None], (self.in_features,), self.fold
                )
                if (
                    _int8_enabled()
                    and self.in_features >= _INT8_MIN_CHANNELS
                    and self.features >= _INT8_MIN_CHANNELS
                ):
                    y = _quantized_conv(
                        x.astype(dtype), k, (1, 1), "SAME", dtype
                    )
                else:
                    y = jax.lax.conv_general_dilated(
                        x.astype(dtype), k.astype(dtype), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
            if bias is not None:
                y = y + jnp.tile(bias, self.fold).astype(dtype)
            return y
        if self.fold > 1:
            eye = jnp.eye(self.fold, dtype=kernel.dtype)
            kernel = jnp.einsum("io,ab->aibo", kernel, eye).reshape(
                self.fold * self.in_features, self.fold * self.features
            )
            if bias is not None:
                bias = jnp.tile(bias, self.fold)
        y = x.astype(dtype) @ kernel.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1] // self.fold
        return _DenseParams(
            features=self.features,
            in_features=in_features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            fold=self.fold,
            name="dense",
        )(x)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _ConvParamBank(nn.Module):
    """Raw conv parameters at the same tree path as Conv(...)(name=...):
    <name>/conv/{kernel,bias} — for modules that apply a transformed kernel
    themselves (phase/strided reformulations) while staying checkpoint- and
    torch-import-compatible."""

    kernel_size: tuple
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        return _RawConvParams(
            (kh, kw), self.in_features, self.features, name="conv"
        )()


class _RawConvParams(nn.Module):
    kernel_size: tuple
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        fan_in = self.in_features * kh * kw
        kernel = self.param(
            "kernel", torch_kernel_init,
            (kh, kw, self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", partial(torch_bias_init, fan_in=fan_in),
            (self.features,), jnp.float32,
        )
        return kernel, bias


def _conv(x, k, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class Upsample(nn.Module):
    """nearest-x2 upsample + 3x3 conv (Diffusion_arch.py:72-76).

    fold_out > 1: input is an UNfolded tensor; the output is width-folded.

    Executed as a PHASE DECOMPOSITION rather than materialise-then-conv:
    conv3x3(nearest2x(x)) touches each source pixel through row/col tap
    *sums* (out row 2h' uses x rows {h'-1: K0, h': K1+K2}; out row 2h'+1
    uses {h': K0+K1, h'+1: K2}, same per column), so the whole op is two
    (kh=2, kw=3) convs on the ORIGINAL-resolution tensor whose kernels
    pre-combine those sums, followed by a row interleave. This never
    materialises the 4x-size nearest-upsampled tensor, writes the folded
    output layout directly (the width interleave is exactly the width-fold),
    and runs ~3x fewer conv FLOPs (profiled: the materialised folded conv at
    the 256^2 stage ran at 54 TF/s + a 212us fold-reshape copy).
    Numerically exact up to fp reassociation of the kernel-tap sums
    (parity test: tests/test_resample.py). `naive=True` keeps the
    materialised reference formulation (used by the parity tests)."""

    dim_out: int
    dtype: Optional[Dtype] = None
    fold_out: int = 1
    naive: bool = False

    @nn.compact
    def __call__(self, x):
        if self.naive:
            y = upsample_nearest_2x(x)
            if self.fold_out > 1:
                y = fold_width(y, self.fold_out)
                return Conv(self.dim_out, 3, dtype=self.dtype,
                            fold=self.fold_out, name="conv")(y)
            return Conv(self.dim_out, 3, dtype=self.dtype, name="conv")(y)

        b, h, w, cin = x.shape
        cout = self.dim_out
        k, bias = _ConvParamBank((3, 3), cin, cout, name="conv")()
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        # row-combined kernels per output-row phase dh: (2, 3, cin, cout)
        a0 = jnp.stack([k[0], k[1] + k[2]], axis=0)   # out rows 2h'
        a1 = jnp.stack([k[0] + k[1], k[2]], axis=0)   # out rows 2h'+1
        if self.fold_out > 1:
            assert self.fold_out == 2
            # column-combined per output-slot beta, packed as 2*cout output
            # channels in folded order [beta*cout + c]; kw=3 keeps both
            # betas in one conv (the unused tap per beta is zero).
            def widen(a):
                z = jnp.zeros_like(a[:, :1])
                b0 = jnp.concatenate([a[:, :1], a[:, 1:2] + a[:, 2:3], z], 1)
                b1 = jnp.concatenate([z, a[:, :1] + a[:, 1:2], a[:, 2:3]], 1)
                return jnp.concatenate([b0, b1], axis=-1)  # (2,3,cin,2cout)

            bias_f = jnp.tile(bias, 2).astype(dtype)
            ys = []
            for a, pad_r in ((a0, (1, 0)), (a1, (0, 1))):
                kk = widen(a).astype(dtype)
                ys.append(_conv(x, kk, (1, 1), [pad_r, (1, 1)]) + bias_f)
            y = jnp.stack(ys, axis=2)  # (b, h, 2, w, 2cout)
            return y.reshape(b, 2 * h, w, 2 * cout)

        # unfolded output: 4 (kh=2, kw=2) phase convs, no zero taps
        def narrow(a, dw):  # column combine for output-col phase dw
            if dw == 0:
                return jnp.stack([a[:, 0], a[:, 1] + a[:, 2]], axis=1)
            return jnp.stack([a[:, 0] + a[:, 1], a[:, 2]], axis=1)

        bias = bias.astype(dtype)
        ys = []
        for a, pad_r in ((a0, (1, 0)), (a1, (0, 1))):
            for dw, pad_c in ((0, (1, 0)), (1, (0, 1))):
                kk = narrow(a, dw).astype(dtype)
                ys.append(_conv(x, kk, (1, 1), [pad_r, pad_c]) + bias)
        y = jnp.stack(
            [jnp.stack(ys[:2], axis=3), jnp.stack(ys[2:], axis=3)], axis=2
        )  # (b, h, dh, w, dw, cout)
        return y.reshape(b, 2 * h, 2 * w, cout)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """'b (h 2) (w 2) c -> b h w (c 2 2)' with (c, p1, p2) channel order.

    Matches the reference Rearrange('b c (h p1) (w p2) -> b (c p1 p2) h w')
    so conv1x1 weights are import-compatible.
    """
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b h w c p1 p2
    return x.reshape(b, h, w, c * 4)


class Downsample(nn.Module):
    """space-to-depth + 1x1 conv (Diffusion_arch.py:78-82).

    fold_in / fold_out: width-fold state of the input / output tensors.

    Executed as ONE strided conv instead of materialising the
    space-to-depth: s2d + 1x1 conv over (c, p1, p2)-ordered channels is
    exactly a 2x2 stride-2 conv with the rearranged kernel, and on a
    width-folded input the stride-2 column pairs are the two channel slots
    of a single folded column, so the conv shrinks to (kh=2, kw=1) —
    the s2d transpose copy (profiled 259us at the 256^2 stage) never
    exists. Bit-identical kernel values (a pure reindexing, no arithmetic).
    `naive=True` keeps the materialised formulation (parity tests)."""

    dim_out: int
    dtype: Optional[Dtype] = None
    fold_in: int = 1
    fold_out: int = 1
    naive: bool = False

    @nn.compact
    def __call__(self, x):
        if self.naive or (self.fold_in == 1 and self.fold_out > 1):
            # (fold_in=1, fold_out=2) is unreachable in the model family;
            # keep the reference formulation for it rather than a 4-wide
            # strided kernel nobody exercises.
            if self.fold_in > 1:
                x = unfold_width(x, self.fold_in)
            y = space_to_depth(x)
            if self.fold_out > 1:
                y = fold_width(y, self.fold_out)
                return Conv(self.dim_out, 1, dtype=self.dtype,
                            fold=self.fold_out, name="conv")(y)
            return Conv(self.dim_out, 1, dtype=self.dtype, name="conv")(y)

        cf = x.shape[-1]
        cin = cf // self.fold_in
        out = self.dim_out
        k, bias = _ConvParamBank((1, 1), 4 * cin, out, name="conv")()
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        # (1,1,4C,O) with input channel index c*4 + p1*2 + p2  ->  (p1,p2,c,o)
        k2 = k[0, 0].reshape(cin, 2, 2, out).transpose(1, 2, 0, 3)
        if self.fold_in == 1:
            y = _conv(x, k2.astype(dtype), (2, 2), "VALID")
            return y + bias.astype(dtype)
        assert self.fold_in == 2
        # folded input: column pair (2w', 2w'+1) = slots of folded col w'
        k3 = k2.reshape(2, 1, 2 * cin, out)  # [p2*cin + c] slot-major = folded
        if self.fold_out == 1:
            y = _conv(x, k3.astype(dtype), (2, 1), "VALID")
            return y + bias.astype(dtype)
        assert self.fold_out == 2
        z = jnp.zeros_like(k3[:, 0])
        k4 = jnp.stack(
            [jnp.concatenate([k3[:, 0], z], -1), jnp.concatenate([z, k3[:, 0]], -1)],
            axis=1,
        )  # (2, 2, 2cin, 2out): output slot beta_o reads folded col 2w''+beta_o
        y = _conv(x, k4.astype(dtype), (2, 2), "VALID")
        return y + jnp.tile(bias, 2).astype(dtype)


class RMSNorm(nn.Module):
    """Channelwise RMS norm: F.normalize(x, dim=C) * g * sqrt(C) (:84-90).

    torch F.normalize divides by max(||x||_2, eps) with eps=1e-12.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("g", jax.nn.initializers.ones, (c,), jnp.float32)
        norm = jnp.maximum(
            jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        )
        out = x / norm.astype(x.dtype)
        return out * g.astype(x.dtype) * (c ** 0.5)


class SinusoidalPosEmb(nn.Module):
    """Transformer-style timestep embedding (:94-107)."""

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        emb = math.log(self.theta) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """crowsonkb-style random/learned fourier time features (:109-124)."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        if self.is_random:
            # fixed (non-trainable) random frequencies: use a constant-seeded
            # draw stored as a variable so checkpoints are reproducible.
            weights = self.variable(
                "constants",
                "weights",
                lambda: jax.random.normal(jax.random.PRNGKey(0), (half_dim,)),
            ).value
        else:
            weights = self.param(
                "weights", jax.nn.initializers.normal(1.0), (half_dim,), jnp.float32
            )
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Spatial coordinate fourier features: 1x1 conv then [x, sin, cos] (:322-337).

    Input (B, H, W, in_dim) -> output (B, H, W, hidden_dim * 3).
    """

    hidden_dim: int
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, coords):
        x = Conv(self.hidden_dim, 1, dtype=self.dtype, fold=self.fold,
                 name="weights")(coords)
        freqs = x * (2 * math.pi)
        if self.fold > 1:
            # folded output channel order must stay [beta*C3 + c] with
            # C3 = 3*hidden: concat per beta block
            hd = self.hidden_dim
            parts = []
            for b in range(self.fold):
                xb = x[..., b * hd : (b + 1) * hd]
                fb = freqs[..., b * hd : (b + 1) * hd]
                parts.append(jnp.concatenate([xb, jnp.sin(fb), jnp.cos(fb)], axis=-1))
            return jnp.concatenate(parts, axis=-1)
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Mlp(nn.Module):
    """1x1-conv MLP: fc1 -> act -> fc2 (:340-356). Dropout is 0 in all configs."""

    hidden_features: int
    out_features: int
    act: Callable = jax.nn.silu
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.hidden_features, 1, dtype=self.dtype, fold=self.fold,
                 name="fc1")(x)
        x = self.act(x)
        return Conv(self.out_features, 1, dtype=self.dtype, fold=self.fold,
                    name="fc2")(x)


class LayerNorm(nn.Module):
    """nn.LayerNorm-compatible params ('scale', 'bias'); fold > 1 normalises
    each folded pixel's real channel block independently (exact unfolded
    semantics). Centered fp32 statistics like torch LayerNorm."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        cf = x.shape[-1]
        c = cf // self.fold
        scale = self.param("scale", jax.nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros, (c,), jnp.float32)
        if self.fold == 1:
            # fp32 accumulation inside the fused reduces; the broadcast stats
            # and the normalise itself stay in the model dtype (an fp32 copy
            # of the activation would double HBM traffic)
            mean = x.astype(jnp.float32).mean(-1, keepdims=True).astype(x.dtype)
            d = x - mean
            var = (
                (d.astype(jnp.float32) ** 2).mean(-1, keepdims=True).astype(x.dtype)
            )
            y = d * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
            return y * scale.astype(x.dtype) + bias.astype(x.dtype)
        # folded: per-beta statistics WITHOUT lane slices/reshapes (profiled
        # 10x slower): one (fold*c, fold*c) block-diagonal averaging matmul
        # broadcasts each beta block's mean back to its own channels. The
        # matmuls run on model-dtype tensors with fp32 accumulation
        # (preferred_element_type) and the broadcast stats are kept in the
        # model dtype — materialising fp32 stat maps doubles HBM traffic
        # (profiled ~0.4 ms per map at this shape).
        m_avg = jnp.asarray(
            np.kron(np.eye(self.fold, dtype=np.float32), np.full((c, c), 1.0 / c))
        ).astype(x.dtype)
        mean = jnp.einsum(
            "...c,cd->...d", x, m_avg, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        d = x - mean
        var = jnp.einsum(
            "...c,cd->...d", d * d, m_avg, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        scale_f = jnp.tile(scale, self.fold).astype(x.dtype)
        bias_f = jnp.tile(bias, self.fold).astype(x.dtype)
        y = d * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype)) * scale_f
        return y + bias_f


def _gn_stats_mxu_enabled(dtype) -> bool:
    """Whether GN stats are computed as MXU contractions instead of VPU
    reduces (NOISEDIFF_GN_STATS=mxu; default off — measured dead end).

    Hypothesis: in the crop-512 train graph the conv emitters pin full-res
    activations to batch-in-sublanes layouts (bf16{3,0,2,1:T(4,128)}), and
    the stats reduce over (H, W) of such a tensor runs ~16x off the HBM
    roofline (profiled 1.25 ms per GN for a 50 MB read — the
    "AllBatchInSubla" fusion kind; the identical reduce on a
    {3,2,1,0:T(8,128)} tensor measures 0.14 ms). Expressing the sums as
    dot_generals hands the op to the MXU, which has its own layout
    machinery. Measured (scripts/bench_train_ab.py, crop 512 / bs 4,
    2026-08-19): reduce 332.0 ms/step, mxu 341.4 ms/step — the dot-shaped
    consumer forces its own relayouts and LOSES 3%; XLA's fused reduces
    win in context. Kept opt-in + parity-tested
    (tests/test_groupnorm_kernel.py::test_gn_stats_mxu_parity). Exact
    products for bf16 inputs (bf16 multiplies are exact in the f32
    accumulator; only summation order differs, ~1e-6 rel); fp32 inputs
    would additionally lose precision to the TPU's bf16-pass fp32 dots."""
    return os.environ.get("NOISEDIFF_GN_STATS", "") == "mxu"


## Trace-time training marker for the GN kernel gate. The streaming
## GN-stats kernels are a measured TRAIN win (+28% step time, crop 512 —
## BENCH_NOTES round-3) and a measured EVAL loss (~6.5% per UNet eval at
## the generation shapes: the sampler graph keeps activations in layouts
## whose XLA reduces are already fine, and the custom-call adds ~1.3 ms
## per eval — round-3 verdict Weak #1, reproduced on-chip). The train
## steps (train/state.py) trace their loss/grad under this context; the
## samplers and eval paths never set it, so the kernels stay out of
## generation. Trace-time only: the flag is read while jit traces, and
## every caller owns its jit (the same traced function is never shared
## across contexts).
_GN_TRAIN_TRACE = [False]


@contextlib.contextmanager
def gn_train_trace():
    """Mark the enclosed tracing as a TRAINING step (enables the
    train-only Pallas GN kernels; see _gn_stats_pallas_mode)."""
    prev = _GN_TRAIN_TRACE[0]
    _GN_TRAIN_TRACE[0] = True
    try:
        yield
    finally:
        _GN_TRAIN_TRACE[0] = prev


def _gn_stats_pallas_mode(x):
    """'' (off) | 'tpu' | 'interpret' — whether GN stats stream through the
    Pallas kernel (ops/pallas/gn_stats.py). DEFAULT ON for large
    activations on single-chip TPU *inside a training-step trace*
    (gn_train_trace): the conv emitters pin full-res activations to
    batch-in-sublanes layouts whose XLA stats reduces run ~16x off the
    HBM roofline (see _gn_stats_mxu_enabled's ledger); the kernel
    streams them at Mosaic DMA rates instead. Measured in-model
    (scripts/bench_train_ab.py, crop 512 / bs 4, 2026-08-19):
    reduce 331.7 ms/step -> pallas 294.7 ms/step (+12.6%, 3.39 steps/s).
    In the GENERATION graph the same kernel LOSES ~6.5% per UNet eval
    (round-3 verdict, reproduced: 21.98 vs 20.64 ms/eval at 256^2 bs=8),
    so outside a train trace the gate stays off and eval keeps XLA's
    fused reduces. NOISEDIFF_GN_STATS=reduce/mxu opts out everywhere;
    =pallas forces the TPU gate regardless of context; =pallas-interpret
    forces interpret mode (CPU tests). Multi-chip routes through the
    kernel's custom_partitioning wrapper (ops/pallas/gn_stats.gn_stats_p):
    b/c pass through, h/w are reduction factors, so pjit shards the
    stream per chip and inserts a psum only when the spatial dims
    themselves are mesh-sharded."""
    flag = os.environ.get("NOISEDIFF_GN_STATS", "")
    if flag == "pallas-interpret":
        return "interpret"
    if flag not in ("", "pallas"):
        return ""
    if flag != "pallas" and not _GN_TRAIN_TRACE[0]:
        return ""
    if jax.default_backend() == "tpu" and x.shape[1] * x.shape[2] >= 4096:
        return "tpu"
    return ""


def _gn_stats_sums(x):
    """(b, h, w, cf) -> fp32 per-(batch, channel) sums (sum x, sum x^2)."""
    b, h, w, cf = x.shape
    pallas_mode = _gn_stats_pallas_mode(x)
    if pallas_mode:
        from ..ops.pallas.gn_stats import gn_stats_vjp

        return gn_stats_vjp(x, pallas_mode == "interpret")
    if _gn_stats_mxu_enabled(x.dtype):
        x2 = x.reshape(b, h * w, cf)
        ones = jnp.ones((b, h * w), x.dtype)
        s_c = jnp.einsum(
            "bpc,bp->bc", x2, ones, preferred_element_type=jnp.float32
        )
        gram = jnp.einsum(
            "bpc,bpd->bcd", x2, x2, preferred_element_type=jnp.float32
        )
        sq_c = jnp.diagonal(gram, axis1=1, axis2=2)
        return s_c, sq_c
    xf = x.astype(jnp.float32)
    return xf.sum(axis=(1, 2)), (xf * xf).sum(axis=(1, 2))


def _gn_coeffs_primal(x, scale, bias, groups, eps, fold):
    """Per-(batch, folded-channel) GroupNorm affine coefficients (a, bb) so
    that normalise+scale+bias == x*a + bb. fp32 stats (torch semantics,
    uncentered variance); fold > 1 pools both folded copies of a channel.
    Returns ((a, bb), (s_c, sq_c)) — the per-channel sums are stashed as
    custom-vjp residuals (tiny (b, c) tensors) so the backward never
    re-reduces the activation."""
    b, h, w, cf = x.shape
    c = cf // fold
    s_c, sq_c = _gn_stats_sums(x)
    if fold > 1:
        s_c = s_c.reshape(b, fold, c).sum(1)
        sq_c = sq_c.reshape(b, fold, c).sum(1)
    cnt = h * w * fold * (c // groups)
    s_g = s_c.reshape(b, groups, -1).sum(-1)
    sq_g = sq_c.reshape(b, groups, -1).sum(-1)
    mean_g = s_g / cnt
    var_g = sq_g / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=1)
    inv_c = jnp.repeat(inv_g, c // groups, axis=1)
    a = inv_c * scale[None, :]
    bb = bias[None, :] - mean_c * a
    if fold > 1:
        a = jnp.tile(a, (1, fold))
        bb = jnp.tile(bb, (1, fold))
    return (a, bb), (s_c, sq_c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_coeffs(x, scale, bias, groups, eps, fold):
    """GroupNorm affine coefficients with an analytic backward. Autodiff of
    the stats reduces materialises fp32 activation-sized cotangent chains
    (at crop 512 each is a 201 MB tensor); the analytic dx is the closed
    form dx = ds_c + 2*x*dsq_c — one bf16 read of x, one bf16 write of dx,
    everything else (b, c)-sized fp32."""
    return _gn_coeffs_primal(x, scale, bias, groups, eps, fold)[0]


def _gnc_fwd(x, scale, bias, groups, eps, fold):
    (a, bb), (s_c, sq_c) = _gn_coeffs_primal(x, scale, bias, groups, eps, fold)
    return (a, bb), (x, scale, s_c, sq_c)


def _gnc_bwd(groups, eps, fold, res, g):
    x, scale, s_c, sq_c = res
    da, dbb = g  # (b, cf) f32
    b, h, w, cf = x.shape
    c = cf // fold
    if fold > 1:
        da = da.reshape(b, fold, c).sum(1)
        dbb = dbb.reshape(b, fold, c).sum(1)
    cnt = h * w * fold * (c // groups)
    s_g = s_c.reshape(b, groups, -1).sum(-1)
    sq_g = sq_c.reshape(b, groups, -1).sum(-1)
    mean_g = s_g / cnt
    var_g = sq_g / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=1)
    inv_c = jnp.repeat(inv_g, c // groups, axis=1)
    # parameter grads:  a = inv_c*scale,  bb = bias - mean_c*inv_c*scale
    dscale = (inv_c * da - mean_c * inv_c * dbb).sum(0)
    dbias = dbb.sum(0)
    # chain to the stats:  d(inv_c), d(mean_c) -> group sums -> s, sq
    p_c = scale[None, :] * (da - mean_c * dbb)  # d inv_c
    q_c = -inv_c * scale[None, :] * dbb         # d mean_c
    dinv_g = p_c.reshape(b, groups, -1).sum(-1)
    dmean_g = q_c.reshape(b, groups, -1).sum(-1)
    dvar_g = -0.5 * inv_g**3 * dinv_g
    dmean_g = dmean_g - 2.0 * mean_g * dvar_g
    dsq_g = dvar_g / cnt
    ds_g = dmean_g / cnt
    ds_c = jnp.repeat(ds_g, c // groups, axis=1)
    dsq_c = jnp.repeat(dsq_g, c // groups, axis=1)
    if fold > 1:
        ds_c = jnp.tile(ds_c, (1, fold))
        dsq_c = jnp.tile(dsq_c, (1, fold))
    dt = x.dtype
    dx = (
        x * (2.0 * dsq_c)[:, None, None, :].astype(dt)
        + ds_c[:, None, None, :].astype(dt)
    )
    return dx, dscale, dbias


_gn_coeffs.defvjp(_gnc_fwd, _gnc_bwd)


def _gn_apply_plain(x, a, bb):
    """y = x*a + bb with fp32 (b, cf) coeffs broadcast in the model dtype."""
    return (
        x * a[:, None, None, :].astype(x.dtype)
        + bb[:, None, None, :].astype(x.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gn_apply(x, a, bb, interpret):
    """The GN affine application with a Pallas-streamed backward.

    Autodiff of y = x*a + bb needs da = sum_hw(g*x) and dbb = sum_hw(g) —
    per-channel reduces over full-res activations that the conv emitters
    pin to batch-in-sublanes layouts, which XLA lowers to the same
    lane-hostile "AllBatchInSubla" multiply_reduce fusions the forward
    stats kernel already displaced (~16 ms/step + forced layout copies in
    the crop-512 train profile, BENCH_NOTES round-3). The backward here
    streams g and x through ops/pallas/gn_stats.gn_grad_stats at Mosaic
    DMA rates; dx = g*a stays an XLA elementwise fusion."""
    return _gn_apply_plain(x, a, bb)


def _gna_fwd(x, a, bb, interpret):
    return _gn_apply_plain(x, a, bb), (x, a)


def _gna_bwd(interpret, res, g):
    x, a = res
    from ..ops.pallas.gn_stats import gn_grad_stats_dispatch

    dbb, da = gn_grad_stats_dispatch(g, x, interpret)
    dx = g * a[:, None, None, :].astype(g.dtype)
    return dx, da, dbb


_gn_apply.defvjp(_gna_fwd, _gna_bwd)


def _film_fold(a, bb, scale_shift):
    """Fold a per-batch time-FiLM y*(s+1) + sh into the (b, cf) GN affine
    coeffs: (x*a + bb)*(s+1) + sh == x*[a*(s+1)] + [bb*(s+1) + sh]. The
    FiLM then rides the single affine application — its backward needs no
    full-res reduce of its own (autodiff of the broadcast multiply needs
    ds = sum_hw(g*y), the same lane-hostile pattern _gn_apply displaces);
    everything FiLM-specific stays (b, cf)-sized fp32. Per-pixel FiLM
    (ResnetBlock2's conv-predicted maps) cannot fold — returned unchanged.
    Returns (a, bb, remaining_scale_shift)."""
    if scale_shift is None:
        return a, bb, None
    s, sh = scale_shift
    if s.ndim != 4 or s.shape[1] != 1 or s.shape[2] != 1:
        return a, bb, scale_shift
    s32 = s.reshape(s.shape[0], -1).astype(jnp.float32) + 1.0
    sh32 = sh.reshape(sh.shape[0], -1).astype(jnp.float32)
    return a * s32, bb * s32 + sh32, None


def _gn_normalize(x, a, bb):
    """Route the GN affine application: Pallas-streamed backward when the
    stats kernel is active for this shape (same gate — large activations
    on TPU, or the interpret-mode test flag), plain XLA math otherwise.
    NOISEDIFF_GN_APPLY_BWD=xla opts just this backward out for A/B."""
    mode = _gn_stats_pallas_mode(x)
    if mode and os.environ.get("NOISEDIFF_GN_APPLY_BWD", "") != "xla":
        return _gn_apply(x, a, bb, mode == "interpret")
    return _gn_apply_plain(x, a, bb)


def _gn_analytic_bwd_enabled() -> bool:
    """Whether GroupNorm stats use the analytic custom backward above
    (default on; NOISEDIFF_GN_BWD=xla restores plain autodiff)."""
    return os.environ.get("NOISEDIFF_GN_BWD", "") != "xla"


class _GNParams(nn.Module):
    """GroupNorm parameter holder + both execution paths.

    Named 'norm' inside the GroupNorm wrapper so the parameter paths stay
    norm/norm/{scale,bias} — the layout the torch-checkpoint keymap and
    existing snapshots expect. The fused path hands norm+FiLM+SiLU to the
    single-pass Pallas kernel (ops/pallas/groupnorm_silu.py).

    fold > 1: x is width-folded (fold_width); parameters keep the real
    channel width and per-group statistics pool both folded copies of each
    channel (exactly the unfolded math)."""

    groups: int = 8
    eps: float = 1e-5
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, scale_shift=None, fuse_tail: bool = False):
        b, h, w, cf = x.shape
        c = cf // self.fold
        scale = self.param("scale", jax.nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros, (c,), jnp.float32)

        if self.fold > 1:
            # scale_shift (if any) arrives already folded from the caller.
            # The normalisation folds into one per-(batch,channel) affine
            # y = x*a + bb applied in the model dtype: materialising the
            # f32 normalised activation costs 2x HBM traffic (profiled)
            if _gn_analytic_bwd_enabled():
                a, bb = _gn_coeffs(x, scale, bias, self.groups, self.eps,
                                   self.fold)
                a, bb, scale_shift = _film_fold(a, bb, scale_shift)
                y = _gn_normalize(x, a, bb)
            else:
                a, bb = _gn_coeffs_primal(x, scale, bias, self.groups,
                                          self.eps, self.fold)[0]
                a, bb, scale_shift = _film_fold(a, bb, scale_shift)
                y = _gn_apply_plain(x, a, bb)
            if scale_shift is not None:
                s, sh = scale_shift
                y = y * (s + 1.0) + sh
            return jax.nn.silu(y)
        c = cf

        if fuse_tail:
            from ..ops.pallas.groupnorm_silu import fused_groupnorm_film_silu

            fs = fsh = None
            if scale_shift is not None:
                fs = scale_shift[0].reshape(b, c).astype(jnp.float32)
                fsh = scale_shift[1].reshape(b, c).astype(jnp.float32)
            out = fused_groupnorm_film_silu(
                x.reshape(b, h * w, c), scale, bias, fs, fsh, self.groups, self.eps
            )
            return out.reshape(b, h, w, c)

        # plain GN (torch semantics: fp32 stats, biased variance, eps inside).
        # Stats as per-CHANNEL fused reduces + a tiny (b, c) group reshape:
        # reshaping the full activation to (b, h, w, g, c/g) forces
        # lane-hostile 5-d layouts on TPU (profiled 10-30x slower). The
        # variance is the uncentered E[x^2]-mean^2 form; in fp32 at
        # activation magnitudes this differs from the centered form by
        # ~1e-6 relative, far below bf16 output rounding.
        # One per-(batch,channel) affine in the model dtype; the stats get
        # an analytic custom backward (see _gn_coeffs).
        if _gn_analytic_bwd_enabled():
            a, bb = _gn_coeffs(x, scale, bias, self.groups, self.eps, 1)
            a, bb, scale_shift = _film_fold(a, bb, scale_shift)
            y = _gn_normalize(x, a, bb)
        else:
            a, bb = _gn_coeffs_primal(x, scale, bias, self.groups, self.eps, 1)[0]
            a, bb, scale_shift = _film_fold(a, bb, scale_shift)
            y = _gn_apply_plain(x, a, bb)
        if scale_shift is not None:
            s, sh = scale_shift
            y = y * (s + 1.0) + sh
        return jax.nn.silu(y)


class GroupNorm(nn.Module):
    """Block's norm+FiLM+SiLU tail. The wrapper is instantiated with
    name='norm' and holds _GNParams as an inner module also named 'norm', so
    parameter paths stay block*/norm/norm/{scale,bias} — the layout the
    torch-checkpoint keymap and existing snapshots expect."""

    groups: int = 8
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, scale_shift=None, fuse_tail: bool = False):
        return _GNParams(self.groups, dtype=self.dtype, fold=self.fold, name="norm")(
            x, scale_shift, fuse_tail
        )


def _fuse_tail_ok(x, scale_shift) -> bool:
    """Use the Pallas kernel when opted in (NOISEDIFF_FUSED_GN=1), on TPU,
    the FiLM is per-batch broadcast (time-FiLM), and one sample's activations
    fit the VMEM budget.

    Round-2 status: the kernel now compiles and validates on the real v5e
    (fixed Mosaic block specs + HIGHEST-precision stats dots + chunked fp32
    streaming), but stays opt-in because it does not beat the XLA path: the
    GN here is fused per-channel reduces + a dtype-native affine (see
    _GNParams) at near-peak HBM utilisation, while Mosaic DMA on this
    runtime sustains only ~164 GB/s vs XLA's ~636 GB/s (BENCH_NOTES.md)."""
    import os

    if not os.environ.get("NOISEDIFF_FUSED_GN"):
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    from ..ops.pallas.groupnorm_silu import fits_vmem

    if not fits_vmem(h * w, c, x.dtype.itemsize):
        return False
    if scale_shift is not None:
        s = scale_shift[0]
        if s.ndim != 4 or s.shape[1] != 1 or s.shape[2] != 1:
            return False  # per-pixel FiLM (ResnetBlock2) stays on the XLA path
    return True


class Block(nn.Module):
    """conv3x3 -> GroupNorm -> (optional FiLM: x*(scale+1)+shift) -> SiLU (:128-144)."""

    dim_out: int
    groups: int = 8
    ks: int = 3
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv(
            self.dim_out, self.ks, dtype=self.dtype, fold=self.fold, name="proj"
        )(x)
        return GroupNorm(self.groups, dtype=self.dtype, fold=self.fold, name="norm")(
            x, scale_shift,
            fuse_tail=self.fold == 1 and _fuse_tail_ok(x, scale_shift),
        )


class ResnetBlock(nn.Module):
    """Two FiLM blocks + residual 1x1 (:146-170).

    NOTE (reference quirk, Diffusion_arch.py:154-155): the ctor accepts ks/pd
    but Block is constructed with hardcoded ks=3 — so even `shot_time`, built
    with ks=1, runs 3x3 convs. We reproduce the effective behaviour (ks=3).
    """

    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, time_emb=None):
        """x: a tensor or a tuple (channel-concat parts, e.g. skip joins)."""
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            t = Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                jax.nn.silu(time_emb)
            )
            t = t[:, None, None, :]
            scale, shift = jnp.split(t, 2, axis=-1)
            if self.fold > 1:
                scale = jnp.tile(scale, (1, 1, 1, self.fold))
                shift = jnp.tile(shift, (1, 1, 1, self.fold))
            scale_shift = (scale, shift)

        h = Block(
            self.dim_out, self.groups, dtype=self.dtype, fold=self.fold,
            name="block1",
        )(x, scale_shift)
        h = Block(self.dim_out, self.groups, dtype=self.dtype, fold=self.fold,
                  name="block2")(h)
        parts = x if isinstance(x, (list, tuple)) else (x,)
        real_in = sum(p.shape[-1] for p in parts) // self.fold
        if real_in != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype, fold=self.fold,
                     name="res_conv")(x)
        elif isinstance(x, (list, tuple)):
            # identity residual on a concat input. Folded parts must be
            # interleaved per fold slot: a plain channel concat would give
            # [a0|a1|b0|b1] while the folded layout of concat(a, b) is
            # [a0|b0|a1|b1] — Block's output (and the folded-concat kernel
            # slicing) uses the latter, so a plain concat would silently
            # misalign the residual add. (Reachable whenever a folded stage
            # has x_ch + skip_ch == dim_out, e.g. small-dim test models.)
            if self.fold == 1:
                x = jnp.concatenate(x, axis=-1)
            else:
                segs = [
                    p[..., beta * (p.shape[-1] // self.fold):
                          (beta + 1) * (p.shape[-1] // self.fold)]
                    for beta in range(self.fold)
                    for p in x
                ]
                x = jnp.concatenate(segs, axis=-1)
        return h + x


class _SplitFilmConv(nn.Module):
    """Spatial-FiLM 1x1 conv whose single (1,1,pos_dim,2C) parameter (paths
    'conv/kernel', 'conv/bias' — identical to Conv(dim_out*2, 1)) is applied
    as two separate folded convs producing (scale, shift) directly in the
    folded channel layout."""

    dim_out: int
    fold: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pos_emb):
        c = self.dim_out
        in_f = pos_emb.shape[-1] // self.fold
        k, b = _RawConvParams((1, 1), in_f, 2 * c, name="conv")()
        dtype = self.dtype or pos_emb.dtype
        outs = []
        for half in range(2):  # 0 = scale, 1 = shift
            ks = k[:, :, :, half * c : (half + 1) * c]
            bs = b[half * c : (half + 1) * c]
            kf = _fold_conv_kernel(ks, (in_f,), self.fold).astype(dtype)
            y = jax.lax.conv_general_dilated(
                pos_emb.astype(dtype), kf, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.tile(bs, self.fold).astype(dtype)
            outs.append(y)
        return tuple(outs)


class ResnetBlock2(nn.Module):
    """ResnetBlock with *spatial* FiLM from a positional embedding map (:173-196).

    The scale/shift are per-pixel: SiLU -> 1x1 conv(pos_dim -> 2*dim_out).
    """

    dim_out: int
    pos_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, pos_emb=None):
        scale_shift = None
        if self.pos_emb_dim is not None and pos_emb is not None:
            if self.fold > 1:
                # split the film kernel into scale/shift halves at the
                # PARAMETER level and run two folded convs — slicing the
                # folded (.., fold*2C) activation into per-beta scale/shift
                # pieces costs ~1ms of layout copies per block (profiled)
                scale_shift = _SplitFilmConv(
                    self.dim_out, fold=self.fold, dtype=self.dtype, name="mlp"
                )(jax.nn.silu(pos_emb))
            else:
                p = Conv(self.dim_out * 2, 1, dtype=self.dtype, name="mlp")(
                    jax.nn.silu(pos_emb)
                )
                scale_shift = jnp.split(p, 2, axis=-1)

        h = Block(self.dim_out, self.groups, dtype=self.dtype, fold=self.fold,
                  name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, dtype=self.dtype, fold=self.fold,
                  name="block2")(h)
        if x.shape[-1] // self.fold != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype, fold=self.fold,
                     name="res_conv")(x)
        return h + x


class CrossAttention(nn.Module):
    """Multi-head cross attention over flattened spatial tokens (:361-402).

    When the context has exactly one token (the NoiseDiff ISO embedding is
    (B, 1, 16)), softmax over a singleton key axis is identically 1 and the
    output reduces to a broadcast of to_out(to_v(context)) — independent of
    the queries (and with zero gradient through to_q/to_k). We exploit that
    algebraically: the fast path skips the (B, heads, N, 1) attention tensor
    entirely. This is exact, not an approximation.
    """

    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        # x: (B, N, C); context: (B, M, Cc) or None (self-attention)
        query_dim = x.shape[-1] // self.fold
        inner = self.heads * self.dim_head
        context = x if context is None else context

        to_q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = Dense(query_dim, dtype=self.dtype, name="to_out")

        if context.shape[1] == 1 and mask is None:
            # exact single-token fast path (see class docstring); to_out is
            # applied to the single token and broadcast AFTER — to_out
            # commutes with the token broadcast, so the (B, N, inner)
            # intermediate (and its N-row matmul) never materialises.
            # x may be (B, N, C) tokens or (B, H, W, C) spatial — only its
            # leading/last dims matter here, so no token reshape is forced
            # on the surrounding graph (token-major layouts were profiled
            # poisoning adjacent conv layouts TPU-side).
            _ = to_q  # params still created for checkpoint compatibility
            q = to_q(
                x[(slice(None),) + (slice(0, 1),) * (x.ndim - 2) + (slice(0, query_dim),)]
            )
            del q  # traced for param shape; output unused
            _ = to_k(context)
            v = to_v(context)  # (B, 1, inner)
            out = to_out(v)  # (B, 1, query_dim)
            if self.fold > 1:
                out = jnp.tile(out, (1, 1, self.fold))
            out = out.reshape(
                (x.shape[0],) + (1,) * (x.ndim - 2) + (query_dim * self.fold,)
            )
            return jnp.broadcast_to(out, x.shape)

        assert self.fold == 1, "folded attention requires a single-token context"
        assert x.ndim == 3, "multi-token attention expects (B, N, C) tokens"
        q = to_q(x)
        k = to_k(context)
        v = to_v(context)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head ** -0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        if mask is not None:
            big_neg = jnp.finfo(sim.dtype).max
            sim = jnp.where(mask[:, None, None, :], sim, -big_neg)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        return to_out(out)


class FeedForward(nn.Module):
    """Linear -> GELU -> Linear with mult=2 (:405-422)."""

    mult: int = 2
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1] // self.fold
        h = Dense(dim * self.mult, dtype=self.dtype, fold=self.fold,
                  name="proj_in")(x)
        h = _gelu(h)
        return Dense(dim, dtype=self.dtype, fold=self.fold, name="proj_out")(h)


class _RawDenseParams(nn.Module):
    """nn.Dense-compatible raw params ('kernel', 'bias')."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_kernel_init,
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", partial(torch_bias_init, fan_in=self.in_features),
            (self.features,), jnp.float32,
        )
        return kernel, bias


class _DenseBank(nn.Module):
    """Same param path as Dense(...)(name=...): <name>/dense/{kernel,bias}."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return _RawDenseParams(self.in_features, self.features, name="dense")()


class _FFBank(nn.Module):
    """FeedForward's params at identical paths, returned raw."""

    dim: int
    mult: int = 2

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseBank(self.dim, self.dim * self.mult, name="proj_in")()
        w2, b2 = _DenseBank(self.dim * self.mult, self.dim, name="proj_out")()
        return w1, b1, w2, b2


class _LNBank(nn.Module):
    """LayerNorm's params ('scale', 'bias') at identical paths, returned raw."""

    c: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", jax.nn.initializers.ones, (self.c,), jnp.float32)
        b = self.param("bias", jax.nn.initializers.zeros, (self.c,), jnp.float32)
        return s, b


class _MlpBank(nn.Module):
    """Mlp's conv params at identical paths, returned raw."""

    dim: int
    hidden: int
    out: int

    @nn.compact
    def __call__(self):
        w1, b1 = _ConvParamBank((1, 1), self.dim, self.hidden, name="fc1")()
        w2, b2 = _ConvParamBank((1, 1), self.hidden, self.out, name="fc2")()
        return w1, b1, w2, b2


def _fused_kernel_ok(x) -> bool:
    """Backend/dtype/size eligibility shared by the fused Pallas kernels.

    bf16 only: the fp32 reference-faithful mode keeps the pure XLA path
    (and Mosaic has no exact-erf GELU lowering for the f32 FeedForward).
    Single-chip only: a pallas custom call carries no GSPMD partitioning
    rules, so under a sharded jit (fullframe spatial sharding, multi-chip
    dp) it would force operand replication; those paths stay pure XLA
    until the kernels grow shard_map wrappers. Size floor: small maps are
    not HBM-pass-bound, so the fusion has nothing to win."""
    return (
        jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and x.dtype == jnp.bfloat16
        and x.shape[1] * x.shape[2] >= 4096
    )


def _attn_tail_ok(x) -> bool:
    """Use the fused Pallas AttnBlock tail: default-on on TPU for maps large
    enough that the XLA chain is HBM-pass-bound (NOISEDIFF_FUSED_ATTN=0
    disables; =interpret forces the kernel in interpret mode for tests)."""
    import os

    flag = os.environ.get("NOISEDIFF_FUSED_ATTN", "")
    if flag == "0":
        return False
    if flag == "interpret":
        return True
    return _fused_kernel_ok(x)


class AttnBlock(nn.Module):
    """LN -> cross-attn (+res) -> LN -> FF (+res) -> 1x1 proj, + outer residual (:425-443)."""

    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        b, h, w, cf = x.shape
        c = cf // self.fold
        x_in = x
        # fused single-pass path (1-token context only): the attention output
        # is an x-independent per-sample vector, so the whole block is the
        # channel-local chain proj(FF(LN2(x + tok)) + (x + tok)) + x — one
        # Pallas kernel, one HBM read + write (ops/pallas/attn_tail.py).
        # Parameters are created through path-identical banks / 1-pixel
        # module calls so checkpoints and the torch importer see the exact
        # same tree; XLA DCEs the 1-pixel compute.
        if (
            context is not None and context.shape[1] == 1 and mask is None
            and _attn_tail_ok(x)
        ):
            import os

            from ..ops.pallas.attn_tail import fused_attn_tail

            xs = x[:, :1, :1, :]
            normed_s = LayerNorm(epsilon=1e-5, dtype=self.dtype, fold=self.fold,
                                 name="norm1")(xs)
            tok_map = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                                     fold=self.fold, name="attn")(
                normed_s, context=context
            )  # (B, 1, 1, cf): the broadcast token value
            lns, lnb = _LNBank(c, name="norm2")()
            w1, b1, w2, b2 = _FFBank(c, name="ff")()
            wp, bp = _ConvParamBank((1, 1), c, c, name="proj_out")()
            return fused_attn_tail(
                x, tok_map.reshape(b, cf), lns, lnb, w1, b1, w2, b2,
                wp[0, 0], bp, self.fold, 1e-5,
                os.environ.get("NOISEDIFF_FUSED_ATTN", "") == "interpret",
            )
        # single-token context (NoiseDiffNet's ISO embedding is (B, 1, 16)):
        # every sub-op acts on the channel axis only, so the whole block runs
        # on the 4-D spatial tensor (optionally width-folded). The
        # (B, H*W, C) token flattening the reference uses forces token-major
        # layouts into the neighbouring convolutions on TPU (profiled:
        # layout copies + de-optimised convs); only genuine multi-token
        # attention pays for it.
        fast = context is not None and context.shape[1] == 1 and mask is None
        assert fast or self.fold == 1, "folded AttnBlock needs 1-token context"
        tokens = x if fast else x.reshape(b, h * w, cf)
        normed = LayerNorm(epsilon=1e-5, dtype=self.dtype, fold=self.fold,
                           name="norm1")(tokens)
        tokens = (
            CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                           fold=self.fold, name="attn")(
                normed, context=context, mask=mask
            )
            + tokens
        )
        tokens = (
            FeedForward(dtype=self.dtype, fold=self.fold, name="ff")(
                LayerNorm(epsilon=1e-5, dtype=self.dtype, fold=self.fold,
                          name="norm2")(tokens)
            )
            + tokens
        )
        x = tokens if fast else tokens.reshape(b, h, w, cf)
        x = Conv(c, 1, dtype=self.dtype, fold=self.fold, name="proj_out")(x)
        return x + x_in


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (:198-235)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        y = RMSNorm(dtype=self.dtype, name="norm")(x)
        qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype, name="to_qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * hidden), 3, axis=-1)

        def heads_first(t):  # (B, N, hidden) -> (B, heads, dim_head, N)
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = map(heads_first, (q, k, v))
        q = jax.nn.softmax(q, axis=-2) * (self.dim_head ** -0.5)
        k = jax.nn.softmax(k, axis=-1)
        ctx = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", ctx, q)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = Conv(c, 1, dtype=self.dtype, name="to_out")(out)
        return RMSNorm(dtype=self.dtype, name="out_norm")(out)


class Attention(nn.Module):
    """Full self-attention over spatial tokens (:237-266).

    Replaces the reference's torch-SDPA `Attend` wrapper with
    jax dot-product attention (XLA fuses this into a flash-style kernel on
    TPU; an explicit Pallas kernel is wired in ops/pallas for large token
    counts).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        y = RMSNorm(dtype=self.dtype, name="norm")(x)
        qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype, name="to_qkv")(y)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        n = h * w
        if jax.default_backend() == "tpu" and n >= 1024 and n % 256 == 0:
            from ..ops.pallas.flash_attention import flash_attention

            def bhnd(t):
                return t.transpose(0, 2, 1, 3)

            out = bhnd(flash_attention(bhnd(q), bhnd(k), bhnd(v)))
        else:
            out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, h, w, hidden)
        return Conv(c, 1, dtype=self.dtype, name="to_out")(out)


class TimeMlp(nn.Module):
    """SinusoidalPosEmb -> Dense -> GELU -> Dense (Diffusion_arch.py:502-507)."""

    fourier_dim: int
    time_dim: int
    theta: float = 10000.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, t):
        emb = SinusoidalPosEmb(self.fourier_dim, self.theta, name="sinu")(t)
        emb = Dense(self.time_dim, dtype=self.dtype, name="lin1")(emb)
        emb = _gelu(emb)
        return Dense(self.time_dim, dtype=self.dtype, name="lin2")(emb)
