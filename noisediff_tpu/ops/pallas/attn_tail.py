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
block-diagonal. Backward = a second Pallas kernel (tile-recompute + in-kernel
vjp, param grads accumulated across the sequential grid) on TPU/bf16 or in
interpret mode; NOISEDIFF_FUSED_ATTN_BWD=xla falls back to the jnp-reference
recompute (also the default off-TPU), so the kernel is safe under jax.grad
everywhere.
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


def _tile_chain(x, tokb, lns, lnb, mavg_f32, w1, b1, w2, b2, wp, bp, eps):
    """Per-tile forward on VALUES: shared by the forward kernel and the
    in-kernel vjp of the backward kernel. x/tokb: (m, cf); params folded."""
    dt = x.dtype
    stats_prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def dot(a, bb, prec=None):
        return jax.lax.dot_general(
            a, bb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    tok2 = x + tokb.astype(dt)
    mean = dot(tok2, mavg_f32.astype(dt), stats_prec)   # (m, cf) f32
    d = tok2.astype(jnp.float32) - mean
    var = dot((d * d).astype(dt), mavg_f32.astype(dt), stats_prec) \
        if dt == jnp.bfloat16 else dot(d * d, mavg_f32, stats_prec)
    n = d * jax.lax.rsqrt(var + eps)
    n = (n * lns[0] + lnb[0]).astype(dt)

    h = dot(n, w1.astype(dt)).astype(jnp.float32) + b1[0]
    h = _gelu(h.astype(dt))
    f = dot(h, w2.astype(dt)) + b2[0]
    t2 = f.astype(dt) + tok2
    out = dot(t2, wp.astype(dt)) + bp[0]
    return out.astype(dt) + x


def _tile_chain_hbm(x, tokb, lns, lnb, mavg_f32, w1, b1, w2, b2, wp, bp, eps):
    """_tile_chain for the XLA recompute backward: identical math, but every
    (m, cf) intermediate MATERIALIZES in the model dtype. Inside the Pallas
    kernel the f32 intermediates are VMEM-resident (free); under jax.vjp
    they and their cotangents live in HBM — at crop 512 each is a 201 MB
    f32 tensor, and XLA's HLO-remat then re-streams them (profiled: the
    three full-res attn tails cost ~11 ms/step each in backward). Matmul
    accumulation stays f32 (preferred_element_type + immediate cast: XLA
    fuses the convert into the dot consumer, so only the bf16 result hits
    HBM); fp32 mode is unchanged via _tile_chain."""
    dt = x.dtype
    if dt != jnp.bfloat16:
        return _tile_chain(x, tokb, lns, lnb, mavg_f32, w1, b1, w2, b2, wp,
                           bp, eps)

    def dot(a, bb):
        return jax.lax.dot_general(
            a, bb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    mavg = mavg_f32.astype(dt)
    tok2 = x + tokb.astype(dt)
    mean = dot(tok2, mavg)
    d = (tok2.astype(jnp.float32) - mean).astype(dt)
    var = dot(d * d, mavg)
    n = (d.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(dt)
    n = n * lns[0].astype(dt) + lnb[0].astype(dt)
    h = _gelu((dot(n, w1.astype(dt)) + b1[0]).astype(dt))
    f = (dot(h, w2.astype(dt)) + b2[0]).astype(dt)
    t2 = f + tok2
    out = (dot(t2, wp.astype(dt)) + bp[0]).astype(dt)
    return out + x


def _kernel(x_ref, tok_ref, lns_ref, lnb_ref, mavg_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, wp_ref, bp_ref, o_ref, *, eps):
    # x block: (R, W, B, cf) — the array is fed (H, W, B, C)-transposed so
    # its default (descending) custom-call layout is PHYSICALLY the conv
    # emitters' preferred {3,0,2,1} "batch in sublanes" layout of the
    # original (B, H, W, C) tensor; the surrounding transposes are then
    # layout bitcasts instead of a layout pin that de-optimises every
    # neighbouring convolution (profiled: +4 ms/eval without this).
    r, w, b, cf = x_ref.shape
    m = r * w * b
    x = x_ref[...].reshape(m, cf)
    tokb = jnp.broadcast_to(tok_ref[...][None], (r * w, b, cf)).reshape(m, cf)
    o_ref[...] = _tile_chain(
        x, tokb, lns_ref[...], lnb_ref[...], mavg_ref[...], w1_ref[...],
        b1_ref[...], w2_ref[...], b2_ref[...], wp_ref[...], bp_ref[...], eps,
    ).reshape(r, w, b, cf)


def _tile_rows(h: int, w: int, cf: int,
               limit_elems: int = TILE_TOKEN_LIMIT) -> int:
    """Largest row count R dividing h with R*w*cf elements within budget."""
    limit = max(1, min(limit_elems // max(w * cf, 1), h))
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


# --- Pallas backward -------------------------------------------------------
# The training step pays for this chain 3x per step at full resolution; an
# XLA recompute backward re-materialises the (H,W,B,C) layout transposes as
# real copies and re-runs the LN/FF chain as many HBM passes (profiled
# ~50-70 ms of the 389 ms crop-512 train step). This kernel recomputes the
# tile forward in VMEM and takes grads via jax.vjp traced INSIDE the kernel
# body (one read of x and g, one write of g_x; parameter grads accumulate in
# VMEM across the sequential grid).

# the backward holds ~3x the forward's live fp32 intermediates
TILE_TOKEN_LIMIT_BWD = 1024 * 96


def _bwd_kernel(x_ref, tok_ref, lns_ref, lnb_ref, mavg_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, wp_ref, bp_ref, g_ref,
                gx_ref, gtok_ref, glns_ref, glnb_ref, gw1_ref, gb1_ref,
                gw2_ref, gb2_ref, gwp_ref, gbp_ref, *, eps):
    r, w, b, cf = x_ref.shape
    m = r * w * b
    x = x_ref[...].reshape(m, cf)
    g = g_ref[...].reshape(m, cf)

    def f(x, tok, lns, lnb, w1, b1, w2, b2, wp, bp):
        tokb = jnp.broadcast_to(tok[None], (r * w, b, cf)).reshape(m, cf)
        return _tile_chain(x, tokb, lns, lnb, mavg_ref[...], w1, b1, w2, b2,
                           wp, bp, eps)

    out, vjp = jax.vjp(
        f, x, tok_ref[...], lns_ref[...], lnb_ref[...], w1_ref[...],
        b1_ref[...], w2_ref[...], b2_ref[...], wp_ref[...], bp_ref[...],
    )
    dx, dtok, dlns, dlnb, dw1, db1, dw2, db2, dwp, dbp = vjp(g.astype(out.dtype))

    gx_ref[...] = dx.reshape(r, w, b, cf)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in (gtok_ref, glns_ref, glnb_ref, gw1_ref, gb1_ref, gw2_ref,
                    gb2_ref, gwp_ref, gbp_ref):
            ref[...] = jnp.zeros_like(ref)

    f32 = lambda v: v.astype(jnp.float32)  # noqa: E731
    gtok_ref[...] += f32(dtok)
    glns_ref[...] += f32(dlns)
    glnb_ref[...] += f32(dlnb)
    gw1_ref[...] += f32(dw1)
    gb1_ref[...] += f32(db1)
    gw2_ref[...] += f32(dw2)
    gb2_ref[...] += f32(db2)
    gwp_ref[...] += f32(dwp)
    gbp_ref[...] += f32(dbp)


def _unfold_block_diag(gw, fold):
    """(fold*i, fold*o) folded-weight grad -> (i, o): sum the diagonal blocks
    (the fold replicates the kernel block-diagonally, so off-diagonal blocks
    carry no parameter)."""
    if fold == 1:
        return gw
    fi, fo = gw.shape
    i, o = fi // fold, fo // fold
    return jnp.einsum("aiao->io", gw.reshape(fold, i, fold, o))


def _unfold_vec(gv, fold):
    return gv.reshape(fold, -1).sum(0) if fold > 1 else gv.reshape(-1)


def _pallas_bwd(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, g, fold,
                eps, interpret):
    b_, h, w_, cf = x.shape
    limit_rows = max(1, TILE_TOKEN_LIMIT_BWD // max(w_ * b_ * cf, 1))
    r = next((rr for rr in range(min(limit_rows, h), 0, -1) if h % rr == 0), 1)
    lns, lnb, mavg, w1f, b1f, w2f, b2f, wpf, bpf = _fold_params(
        ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, cf
    )
    hidden = w1f.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((r, w_, b_, cf), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    tp = lambda v: jnp.transpose(v, (1, 2, 0, 3))

    out_shapes = (
        jax.ShapeDtypeStruct((h, w_, b_, cf), x.dtype),        # g_x
        jax.ShapeDtypeStruct((b_, cf), jnp.float32),           # g_tok
        jax.ShapeDtypeStruct((1, cf), jnp.float32),            # g_lns
        jax.ShapeDtypeStruct((1, cf), jnp.float32),            # g_lnb
        jax.ShapeDtypeStruct((cf, hidden), jnp.float32),       # g_w1
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),        # g_b1
        jax.ShapeDtypeStruct((hidden, cf), jnp.float32),       # g_w2
        jax.ShapeDtypeStruct((1, cf), jnp.float32),            # g_b2
        jax.ShapeDtypeStruct((cf, cf), jnp.float32),           # g_wp
        jax.ShapeDtypeStruct((1, cf), jnp.float32),            # g_bp
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(h // r,),
        in_specs=[
            tile,                       # x
            full((b_, cf)),             # tok
            full((1, cf)), full((1, cf)), full((cf, cf)),
            full((cf, hidden)), full((1, hidden)),
            full((hidden, cf)), full((1, cf)),
            full((cf, cf)), full((1, cf)),
            tile,                       # g
        ],
        out_specs=(
            tile,
            full((b_, cf)),
            full((1, cf)), full((1, cf)),
            full((cf, hidden)), full((1, hidden)),
            full((hidden, cf)), full((1, cf)),
            full((cf, cf)), full((1, cf)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        tp(x), tok, lns, lnb, mavg, w1f, b1f, w2f, b2f, wpf, bpf,
        tp(g.astype(x.dtype)),
    )
    (gx_t, gtok, glns, glnb, gw1, gb1, gw2, gb2, gwp, gbp) = outs
    return (
        jnp.transpose(gx_t, (2, 0, 1, 3)).astype(x.dtype),
        gtok.astype(tok.dtype),
        _unfold_vec(glns, fold).astype(ln_scale.dtype),
        _unfold_vec(glnb, fold).astype(ln_bias.dtype),
        _unfold_block_diag(gw1, fold).astype(w1.dtype),
        _unfold_vec(gb1, fold).astype(b1.dtype),
        _unfold_block_diag(gw2, fold).astype(w2.dtype),
        _unfold_vec(gb2, fold).astype(b2.dtype),
        _unfold_block_diag(gwp, fold).astype(wp.dtype),
        _unfold_vec(gbp, fold).astype(bp.dtype),
    )


def _bwd(fold, eps, interpret, residuals, g):
    import os

    # Pallas backward is OPT-IN (NOISEDIFF_FUSED_ATTN_BWD=1) on TPU: it is
    # numerically verified (tests/test_attn_tail.py) and matches the XLA
    # recompute in isolated microbenchmarks (5.3 vs 5.1 ms/grad at the
    # crop-512 shape), but embedding it in the full train-step graph crashes
    # this image's remote tpu_compile_helper (SIGKILL/OOM — the same
    # in-model Mosaic fragility BENCH_NOTES records for large attn tiles).
    # Interpret mode always uses it so the kernel stays covered by tests.
    flag = os.environ.get("NOISEDIFF_FUSED_ATTN_BWD", "")
    use_pallas = flag != "xla" and (
        interpret
        or (
            flag == "1"
            and jax.default_backend() == "tpu"
            and residuals[0].dtype == jnp.bfloat16
        )
    )
    if use_pallas:
        return _pallas_bwd(*residuals, g, fold, eps, interpret)
    return _xla_bwd_2d(*residuals, g, fold, eps)


def _xla_bwd_2d(x, tok, ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, g, fold,
                eps):
    """XLA recompute backward in the (H*W*B, cf) FLATTENED transposed space.

    The naive 4-D recompute (jax.vjp of reference_attn_tail) materialises
    ~2.5 ms layout-conversion copies per tensor in the train step: the
    forward custom call pins (H,W,B,C)-transposed physical layouts while the
    4-D recompute ops prefer batch-major ones. Reshaping the transposed
    tensor to 2-D is a layout BITCAST, and 2-D (m, C) matmul layouts agree
    on both sides, so the same math in 2-D drops the copies. The math is
    _tile_chain — the exact per-tile forward the Pallas kernel runs."""
    b_, h, w_, cf = x.shape
    m = h * w_ * b_
    lns, lnb, mavg, w1f, b1f, w2f, b2f, wpf, bpf = _fold_params(
        ln_scale, ln_bias, w1, b1, w2, b2, wp, bp, fold, cf
    )
    x2 = jnp.transpose(x, (1, 2, 0, 3)).reshape(m, cf)
    g2 = jnp.transpose(g, (1, 2, 0, 3)).reshape(m, cf)

    def f(x2, tok, lns, lnb, w1f, b1f, w2f, b2f, wpf, bpf):
        tokb = jnp.broadcast_to(tok[None], (h * w_, b_, cf)).reshape(m, cf)
        return _tile_chain_hbm(x2, tokb, lns, lnb, mavg, w1f, b1f, w2f,
                               b2f, wpf, bpf, eps)

    out, vjp = jax.vjp(f, x2, tok, lns, lnb, w1f, b1f, w2f, b2f, wpf, bpf)
    dx2, dtok, dlns, dlnb, dw1, db1, dw2, db2, dwp, dbp = vjp(
        g2.astype(out.dtype)
    )
    dx = jnp.transpose(dx2.reshape(h, w_, b_, cf), (2, 0, 1, 3))
    return (
        dx.astype(x.dtype),
        dtok.astype(tok.dtype),
        _unfold_vec(dlns, fold).astype(ln_scale.dtype),
        _unfold_vec(dlnb, fold).astype(ln_bias.dtype),
        _unfold_block_diag(dw1, fold).astype(w1.dtype),
        _unfold_vec(db1, fold).astype(b1.dtype),
        _unfold_block_diag(dw2, fold).astype(w2.dtype),
        _unfold_vec(db2, fold).astype(b2.dtype),
        _unfold_block_diag(dwp, fold).astype(wp.dtype),
        _unfold_vec(dbp, fold).astype(bp.dtype),
    )


fused_attn_tail.defvjp(_fwd, _bwd)
