"""Fused dual-head output Pallas kernel for NoiseDiffNet.

The model's output is `shot_noise + read_noise` (reference
Diffusion_arch.py:643-644) where

    shot_noise = fc2(gelu(fc1(shot)))   # shot_mlp3, 1x1 convs C -> C -> 4
    read_noise = final_conv(x)          # 1x1 conv C -> 4

Both heads project a full-resolution C-channel map down to 4 channels. The
XLA conv emitter is pathological at 4-8 output channels (profiled ~400 us
per head at 256^2/bs8 ≈ 4x worse than the HBM bound), and each head is a
separate pass. This kernel reads both maps once, runs the three tiny
matmuls in VMEM, and writes the single 4-channel (folded: 8) result —
DMA-bound at pallas copy rates. Layout handling matches attn_tail.py: the
arrays are fed (H, W, B, C)-transposed so the custom-call default layout is
physically the conv emitters' preferred layout.

Backward = jnp reference under custom_vjp (recompute).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attn_tail import TILE_TOKEN_LIMIT, _gelu, _tile_rows


def _bd(w, fold):
    if fold == 1:
        return w
    i, o = w.shape
    return jnp.einsum("io,ab->aibo", w, jnp.eye(fold, dtype=w.dtype)).reshape(
        fold * i, fold * o
    )


def reference_dual_head(x, shot_a, shot_b, w1, b1, w2, b2, wr, br,
                        fold: int = 1):
    """jnp composition: fc2(gelu(fc1(shot_a + shot_b))) + conv1x1(x), in
    fp32. Params are the UNfolded kernels; inputs are (B, H, W, fold*c)."""
    dt = x.dtype

    def t(v):
        return jnp.tile(v, fold).astype(dt)

    h = (shot_a + shot_b) @ _bd(w1, fold).astype(dt) + t(b1)
    h = _gelu(h)
    sn = h @ _bd(w2, fold).astype(dt) + t(b2)
    rn = x @ _bd(wr, fold).astype(dt) + t(br)
    return (sn + rn).astype(jnp.float32)


def _kernel(x_ref, sa_ref, sb_ref, w1_ref, b1_ref, w2_ref, b2_ref, wr_ref,
            br_ref, o_ref):
    r, w, b, cf = x_ref.shape
    co = o_ref.shape[-1]
    dt = x_ref.dtype

    def dot(a, bb):
        return jax.lax.dot_general(
            a, bb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    x = x_ref[...].reshape(r * w * b, cf)
    s = (sa_ref[...] + sb_ref[...]).reshape(r * w * b, cf)
    h = dot(s, w1_ref[...].astype(dt)).astype(jnp.float32) + b1_ref[0]
    h = _gelu(h.astype(dt))
    out = dot(h, w2_ref[...].astype(dt)) + b2_ref[0]
    out = out + dot(x, wr_ref[...].astype(dt)) + br_ref[0]
    o_ref[...] = out.reshape(r, w, b, co)  # fp32 (the sampler-facing dtype)


def _forward(x, shot_a, shot_b, w1, b1, w2, b2, wr, br, fold, interpret):
    b, h, w, cf = x.shape
    r = _tile_rows(h, w * b, cf)
    w1f, w2f, wrf = _bd(w1, fold), _bd(w2, fold), _bd(wr, fold)
    co = wrf.shape[1]
    row = lambda v: jnp.tile(v, fold).reshape(1, -1).astype(jnp.float32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    tp = lambda v: jnp.transpose(v, (1, 2, 0, 3))
    out_t = pl.pallas_call(
        _kernel,
        grid=(h // r,),
        in_specs=[
            tile, tile, tile,
            full(w1f.shape), full((1, w1f.shape[1])),
            full(w2f.shape), full((1, co)),
            full(wrf.shape), full((1, co)),
        ],
        out_specs=pl.BlockSpec((r, w, b, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, b, co), jnp.float32),
        interpret=interpret,
    )(
        tp(x), tp(shot_a), tp(shot_b),
        w1f, row(b1), w2f, row(b2), wrf, row(br),
    )
    return jnp.transpose(out_t, (2, 0, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_dual_head(x, shot_a, shot_b, w1, b1, w2, b2, wr, br,
                    fold: int = 1, interpret: bool = False):
    """Single-pass dual-head projection, fp32 output (the sampler-facing
    dtype — keeping the convert in-kernel removes a full-tensor convert
    fusion at the scan edge). x/shot_a/shot_b: (B,H,W,fold*c); w1 (c,c),
    w2 (c,co), wr (c,co) unfolded fp32 kernels; returns (B,H,W,fold*co)."""
    return _forward(x, shot_a, shot_b, w1, b1, w2, b2, wr, br, fold,
                    interpret)


def _fwd(x, shot_a, shot_b, w1, b1, w2, b2, wr, br, fold, interpret):
    out = _forward(x, shot_a, shot_b, w1, b1, w2, b2, wr, br, fold,
                   interpret)
    return out, (x, shot_a, shot_b, w1, b1, w2, b2, wr, br)


def _bwd(fold, interpret, residuals, g):
    def ref(*args):
        return reference_dual_head(*args, fold=fold)

    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


fused_dual_head.defvjp(_fwd, _bwd)
