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

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
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
    # torch nn.GELU() defaults to the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


class Conv(nn.Module):
    """2D conv with torch-default init, NHWC."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int | str = "SAME"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size * self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=partial(torch_bias_init, fan_in=fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=partial(torch_bias_init, fan_in=fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """nearest-x2 upsample + 3x3 conv (Diffusion_arch.py:72-76)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.dim_out, 3, dtype=self.dtype, name="conv")(
            upsample_nearest_2x(x)
        )


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
    """space-to-depth + 1x1 conv (Diffusion_arch.py:78-82)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.dim_out, 1, dtype=self.dtype, name="conv")(space_to_depth(x))


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

    @nn.compact
    def __call__(self, coords):
        x = Conv(self.hidden_dim, 1, dtype=self.dtype, name="weights")(coords)
        freqs = x * (2 * math.pi)
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Mlp(nn.Module):
    """1x1-conv MLP: fc1 -> act -> fc2 (:340-356). Dropout is 0 in all configs."""

    hidden_features: int
    out_features: int
    act: Callable = jax.nn.silu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.hidden_features, 1, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return Conv(self.out_features, 1, dtype=self.dtype, name="fc2")(x)


class _GNParams(nn.Module):
    """GroupNorm parameter holder + both execution paths.

    Named 'norm' inside the GroupNorm wrapper so the parameter paths stay
    norm/norm/{scale,bias} — the layout the torch-checkpoint keymap and
    existing snapshots expect. The fused path hands norm+FiLM+SiLU to the
    single-pass Pallas kernel (ops/pallas/groupnorm_silu.py)."""

    groups: int = 8
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None, fuse_tail: bool = False):
        b, h, w, c = x.shape
        scale = self.param("scale", jax.nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros, (c,), jnp.float32)

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

        # plain GN (torch semantics: fp32 stats, biased variance, eps inside)
        xg = x.astype(jnp.float32).reshape(b, h, w, self.groups, c // self.groups)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, h, w, c)
        y = y * scale + bias
        y = y.astype(x.dtype)
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

    @nn.compact
    def __call__(self, x, scale_shift=None, fuse_tail: bool = False):
        return _GNParams(self.groups, dtype=self.dtype, name="norm")(
            x, scale_shift, fuse_tail
        )


def _fuse_tail_ok(x, scale_shift) -> bool:
    """Use the Pallas kernel when opted in (NOISEDIFF_FUSED_GN=1), on TPU,
    the FiLM is per-batch broadcast (time-FiLM), and one sample's activations
    fit the VMEM budget.

    Opt-in for now: the kernel is validated in interpret mode
    (tests/test_groupnorm_kernel.py) but Mosaic compilation stalls on the
    axon-tunneled v5e in this build image — to be re-verified on a directly
    attached chip before flipping the default."""
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

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv(self.dim_out, self.ks, dtype=self.dtype, name="proj")(x)
        return GroupNorm(self.groups, dtype=self.dtype, name="norm")(
            x, scale_shift, fuse_tail=_fuse_tail_ok(x, scale_shift)
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

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            t = Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                jax.nn.silu(time_emb)
            )
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, self.groups, dtype=self.dtype, name="block1")(
            x, scale_shift
        )
        h = Block(self.dim_out, self.groups, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        return h + x


class ResnetBlock2(nn.Module):
    """ResnetBlock with *spatial* FiLM from a positional embedding map (:173-196).

    The scale/shift are per-pixel: SiLU -> 1x1 conv(pos_dim -> 2*dim_out).
    """

    dim_out: int
    pos_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pos_emb=None):
        scale_shift = None
        if self.pos_emb_dim is not None and pos_emb is not None:
            p = Conv(self.dim_out * 2, 1, dtype=self.dtype, name="mlp")(
                jax.nn.silu(pos_emb)
            )
            scale_shift = jnp.split(p, 2, axis=-1)

        h = Block(self.dim_out, self.groups, dtype=self.dtype, name="block1")(
            x, scale_shift
        )
        h = Block(self.dim_out, self.groups, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
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

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        # x: (B, N, C); context: (B, M, Cc) or None (self-attention)
        query_dim = x.shape[-1]
        inner = self.heads * self.dim_head
        context = x if context is None else context

        to_q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = Dense(query_dim, dtype=self.dtype, name="to_out")

        if context.shape[1] == 1 and mask is None:
            # exact single-token fast path (see class docstring)
            _ = to_q  # params still created for checkpoint compatibility
            q = to_q(x[:, :1])  # traced for param shape; output unused
            del q
            _ = to_k(context)
            v = to_v(context)  # (B, 1, inner)
            out = jnp.broadcast_to(v, (x.shape[0], x.shape[1], inner))
            return to_out(out)

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

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = Dense(dim * self.mult, dtype=self.dtype, name="proj_in")(x)
        h = _gelu(h)
        return Dense(dim, dtype=self.dtype, name="proj_out")(h)


class AttnBlock(nn.Module):
    """LN -> cross-attn (+res) -> LN -> FF (+res) -> 1x1 proj, + outer residual (:425-443)."""

    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        b, h, w, c = x.shape
        x_in = x
        tokens = x.reshape(b, h * w, c)
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tokens)
        tokens = (
            CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn")(
                normed, context=context, mask=mask
            )
            + tokens
        )
        tokens = (
            FeedForward(dtype=self.dtype, name="ff")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tokens)
            )
            + tokens
        )
        x = tokens.reshape(b, h, w, c)
        x = Conv(c, 1, dtype=self.dtype, name="proj_out")(x)
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
