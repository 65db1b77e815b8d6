"""Fused AttnBlock tail (single-token-context path) Pallas kernel.

NoiseDiffNet's AttnBlocks (reference Diffusion_arch.py:425-443) attend to a
single ISO token, so the attention output is an x-independent per-sample
vector `tok` (see blocks.CrossAttention) and the whole block reduces to the
channel-local chain

    tok2 = x + tok
    out  = proj(FF(LN2(tok2)) + tok2) + x

Under XLA this chain is 4+ HBM passes over the activation (LN stats +
normalise, FF matmuls, proj, residual adds — profiled ~1.4 ms per full-res
block at 256^2/bs8). This kernel keeps a (rows, C) tile VMEM-resident and
does everything in ONE read + ONE write of x (~190 us at the same shape).

Width-folded tensors (blocks.fold_width) are handled by pre-folding the
parameters: LN statistics become a block-diagonal averaging matmul per
folded slot (exactly the unfolded math), and the FF/proj kernels become
block-diagonal. Backward = jnp reference under custom_vjp (recompute), so
the kernel is safe under jax.grad (training takes the XLA path by default;
see blocks._attn_tail_ok).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-tile element budget (token rows x cf channels): the kernel's live fp32
# intermediates are ~5 token-row buffers (stats, hidden, output) at ~20
# bytes/element of Mosaic scoped-vmem stack against its 16 MiB limit —
# 4096x96 measured fastest of the shapes that compile across all model
# stages (8192x96 compiles standalone but crashes the in-model compile)
TILE_TOKEN_LIMIT = 4096 * 96


def _gelu(x):
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def reference_attn_tail(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp,
                        fold: int = 1, eps: float = 1e-5):
    """jnp composition the kernel must match. x: (B,H,W,cf); tok: (B,cf);
    params are the UNfolded (c,)-sized arrays; fold handled like
    blocks.LayerNorm/Dense."""
    cf = x.shape[-1]
    c = cf // fold
    tok2 = x + tok[:, None, None, :].astype(x.dtype)
    xf = tok2.astype(jnp.float32)
    m = jnp.asarray(np.kron(np.eye(fold, dtype=np.float32),
                            np.full((c, c), 1.0 / c, np.float32)))
    mean = jnp.einsum("...c,cd->...d", xf, m)
    d = xf - mean
    var = jnp.einsum("...c,cd->...d", d * d, m)
    n = d * jax.lax.rsqrt(var + eps)
    n = n * jnp.tile(ln_scale, fold) + jnp.tile(ln_bias, fold)
    n = n.astype(x.dtype)

    def bd(w):  # block-diagonal fold of a dense kernel
        if fold == 1:
            return w
        i, o = w.shape
        return jnp.einsum("io,ab->aibo", w, jnp.eye(fold, dtype=w.dtype)).reshape(
            fold * i, fold * o
        )

    h = _gelu(n @ bd(w1).astype(x.dtype) + jnp.tile(b1, fold).astype(x.dtype))
    f = h @ bd(w2).astype(x.dtype) + jnp.tile(b2, fold).astype(x.dtype)
    t2 = f + tok2
    return t2 @ bd(wp).astype(x.dtype) + jnp.tile(bp, fold).astype(x.dtype) + x


def _kernel(x_ref, tok_ref, lns_ref, lnb_ref, mavg_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, wp_ref, bp_ref, o_ref, *, eps):
    # x block: (R, W, B, cf) — the array is fed (H, W, B, C)-transposed so
    # its default (descending) custom-call layout is PHYSICALLY the conv
    # emitters' preferred {3,0,2,1} "batch in sublanes" layout of the
    # original (B, H, W, C) tensor; the surrounding transposes are then
    # layout bitcasts instead of a layout pin that de-optimises every
    # neighbouring convolution (profiled: +4 ms/eval without this).
    r, w, b, cf = x_ref.shape
    x = x_ref[...].reshape(r * w * b, cf)
    dt = x.dtype
    stats_prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def dot(a, bb, prec=None):
        return jax.lax.dot_general(
            a, bb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    tokb = jnp.broadcast_to(tok_ref[...][None], (r * w, b, cf)).reshape(
        r * w * b, cf
    )
    tok2 = x + tokb.astype(dt)
    mavg = mavg_ref[...].astype(dt)
    mean = dot(tok2, mavg, stats_prec)          # (RW, cf) f32
    d = tok2.astype(jnp.float32) - mean
    var = dot((d * d).astype(dt), mavg.astype(dt), stats_prec) if dt == jnp.bfloat16 \
        else dot(d * d, mavg_ref[...], stats_prec)
    n = d * jax.lax.rsqrt(var + eps)
    n = (n * lns_ref[0] + lnb_ref[0]).astype(dt)

    h = dot(n, w1_ref[...].astype(dt)).astype(jnp.float32) + b1_ref[0]
    h = _gelu(h.astype(dt))
    f = dot(h, w2_ref[...].astype(dt)) + b2_ref[0]
    t2 = f.astype(dt) + tok2
    out = dot(t2, wp_ref[...].astype(dt)) + bp_ref[0]
    o_ref[...] = (out.astype(dt) + x).reshape(r, w, b, cf)


def _tile_rows(h: int, w: int, cf: int) -> int:
    """Largest row count R dividing h with R*w*cf elements within budget."""
    limit = max(1, min(TILE_TOKEN_LIMIT // max(w * cf, 1), h))
    for r in range(limit, 0, -1):
        if h % r == 0:
            return r
    return 1


def _fold_params(ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, cf):
    c = cf // fold

    def bd(w):
        if fold == 1:
            return w
        i, o = w.shape
        return jnp.einsum(
            "io,ab->aibo", w, jnp.eye(fold, dtype=w.dtype)
        ).reshape(fold * i, fold * o)

    mavg = jnp.asarray(np.kron(np.eye(fold, dtype=np.float32),
                               np.full((c, c), 1.0 / c, np.float32)))
    tile = lambda v: jnp.tile(v, fold).reshape(1, -1).astype(jnp.float32)
    return (tile(ln_scale), tile(ln_bias), mavg, bd(w1), tile(b1), bd(w2),
            tile(b2), bd(wp), tile(bp))


def _forward(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, eps,
             interpret):
    b, h, w, cf = x.shape
    r = _tile_rows(h, w * b, cf)
    lns, lnb, mavg, w1f, b1f, w2f, b2f, wpf, bpf = _fold_params(
        ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, cf
    )
    hidden = w1f.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    xt = jnp.transpose(x, (1, 2, 0, 3))  # (H, W, B, C): a layout bitcast
    out_t = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((b, cf)),
            full((1, cf)), full((1, cf)), full((cf, cf)),
            full((cf, hidden)), full((1, hidden)),
            full((hidden, cf)), full((1, cf)),
            full((cf, cf)), full((1, cf)),
        ],
        out_specs=pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, b, cf), x.dtype),
        interpret=interpret,
    )(xt, tok, lns, lnb, mavg, w1f, b1f, w2f, b2f, wpf, bpf)
    return jnp.transpose(out_t, (2, 0, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_attn_tail(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp,
                    fold: int = 1, eps: float = 1e-5, interpret: bool = False):
    """One-HBM-pass AttnBlock tail. x: (B,H,W,cf) with cf = fold*c; tok:
    (B,cf) broadcast attention output; params are the unfolded (c,)-shaped
    LN/FF/proj parameters (fp32)."""
    return _forward(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold,
                    eps, interpret)


def _fwd(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, eps,
         interpret):
    out = _forward(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold,
                   eps, interpret)
    return out, (x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp)


def _bwd(fold, eps, interpret, residuals, g):
    def ref(*args):
        return reference_attn_tail(*args, fold=fold, eps=eps)

    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


fused_attn_tail.defvjp(_fwd, _bwd)
