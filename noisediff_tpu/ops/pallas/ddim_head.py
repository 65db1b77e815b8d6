"""Fused dual-head + DDIM-update Pallas kernel (the sampler mega-kernel).

One DDIM step's tail after the UNet trunk is, in the XLA path:

    shot_noise = fc2(gelu(fc1(shot + shot_res)))     # shot_mlp3, 1x1 convs
    read_noise = final_conv(x)                       # 1x1 conv C -> 4
    v   = (shot_noise + read_noise) -> fp32          # scan-edge convert
    x0  = clip(sqrt(ac_t) * x_t - sqrt(1-ac_t) * v, -1, 1)
    eps = (sqrt(1/ac_t) * x_t - x0) / sqrt(1/ac_t - 1)
    x'  = x0 * sqrt(ac_next) + c * eps + sig * z     # DDIM update
    carry = x'.astype(sample_dtype)

(reference ddp.py:331-354 + :404-444 for the math; Diffusion_arch.py:643-644
for the dual head). This kernel reads the three C-channel trunk maps once,
runs the three tiny matmuls on the MXU, applies the whole DDIM update in
registers (fp32), and writes the single bf16 carry.

**Measured OUTCOME on the v5e (256^2, bs=8, DDIM-100): a dead end.**
Per-UNet-eval: plain scan 19.51 ms, xla-mode fused tail 19.74 ms, this
Pallas kernel 21.17 ms. Two reasons: (a) XLA already fuses the plain tail's
head convs + epilogue chain to near-roofline — the scoped ~0.9 ms was
mostly double-counted fusion; (b) the kernel's re-read of the three C-wide
maps (~150 MB) runs at Mosaic DMA copy rates (~164 GB/s on this runtime vs
XLA's ~636 GB/s), costing ~0.7 ms by itself. Both formulations are kept
opt-in (NOISEDIFF_FUSED_TAIL=xla|pallas, trainer_diffusion._sample_jit) and
exact-parity-tested (tests/test_ddim_head.py); the production default is
the plain scan.

Layout: operands go in (H, W, B, C)-transposed like attn_tail.py — the
transpose is a relabeling of XLA's preferred physical conv layout, so it
costs nothing at the boundary.

Inference-only (no custom_vjp): samplers are not differentiated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attn_tail import TILE_TOKEN_LIMIT, _gelu, _tile_rows
from .dual_head import _bd

# this kernel reads THREE cf-wide operands per tile (trunk map + two shot
# maps) vs attn_tail's one, so its scoped-vmem stack runs ~2x attn_tail's
# per-element cost: the 4096x96 tile measured 16.80M against the 16 MiB
# limit on the v5e. Half the budget compiles and stays DMA-bound.
TILE_ELEMS = TILE_TOKEN_LIMIT // 2

# scalar slots in the per-step vector (padded to 8 for SMEM friendliness)
_S_AC, _S_1MAC, _S_RAC, _S_IRACM1, _S_ANEXT, _S_C, _S_SIG = range(7)
N_SCALARS = 8


def ddim_step_scalars(alpha, alpha_next, sigma, c):
    """Pack the per-step DDIM scalars into a (..., 8) fp32 vector.

    alpha = alphas_cumprod[t_cur]; alpha_next folds the terminal step
    (t_next < 0 -> 1.0); sigma/c as in gaussian.ddim_sample.
    Accepts scalars or length-S vectors (the scan feeds rows).
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    z = jnp.zeros_like(alpha)
    return jnp.stack(
        [
            jnp.sqrt(alpha),
            jnp.sqrt(1.0 - alpha),
            jnp.sqrt(1.0 / alpha),
            1.0 / jnp.sqrt(jnp.maximum(1.0 / alpha - 1.0, 1e-20)),
            jnp.sqrt(jnp.asarray(alpha_next, jnp.float32)),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(sigma, jnp.float32),
            z,
        ],
        axis=-1,
    )


def reference_ddim_head_update(x, shot_a, shot_b, xt, noise, w1, b1, w2, b2,
                               wr, br, scal, fold: int = 1):
    """jnp composition (parity target + CPU fallback).

    x/shot_a/shot_b: (B, H, W, fold*c) trunk maps (model dtype);
    xt/noise: (B, H, W, fold*channels) carry + step noise;
    params: UNfolded fp32 kernels; scal: (8,) from ddim_step_scalars.
    Returns the next carry in xt.dtype.
    """
    from .dual_head import reference_dual_head

    v = reference_dual_head(x, shot_a, shot_b, w1, b1, w2, b2, wr, br,
                            fold=fold)  # fp32
    xt32 = xt.astype(jnp.float32)
    x0 = jnp.clip(scal[_S_AC] * xt32 - scal[_S_1MAC] * v, -1.0, 1.0)
    eps = (scal[_S_RAC] * xt32 - x0) * scal[_S_IRACM1]
    xn = (x0 * scal[_S_ANEXT] + scal[_S_C] * eps
          + scal[_S_SIG] * noise.astype(jnp.float32))
    return xn.astype(xt.dtype)


def _kernel(scal_ref, x_ref, sa_ref, sb_ref, xt_ref, nz_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, wr_ref, br_ref, o_ref):
    r, w, b, cf = x_ref.shape
    co = o_ref.shape[-1]
    dt = x_ref.dtype

    def dot(a, bb):
        return jax.lax.dot_general(
            a, bb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # dual head (dual_head._kernel body)
    x = x_ref[...].reshape(r * w * b, cf)
    s = (sa_ref[...] + sb_ref[...]).reshape(r * w * b, cf)
    h = dot(s, w1_ref[...].astype(dt)).astype(jnp.float32) + b1_ref[0]
    h = _gelu(h.astype(dt))
    v = dot(h, w2_ref[...].astype(dt)) + b2_ref[0]
    v = v + dot(x, wr_ref[...].astype(dt)) + br_ref[0]  # fp32 (rows, co)

    # DDIM update, fp32 in registers
    xt = xt_ref[...].reshape(r * w * b, co).astype(jnp.float32)
    x0 = jnp.clip(scal_ref[0, _S_AC] * xt - scal_ref[0, _S_1MAC] * v,
                  -1.0, 1.0)
    eps = (scal_ref[0, _S_RAC] * xt - x0) * scal_ref[0, _S_IRACM1]
    xn = x0 * scal_ref[0, _S_ANEXT] + scal_ref[0, _S_C] * eps
    xn = xn + scal_ref[0, _S_SIG] * (
        nz_ref[...].reshape(r * w * b, co).astype(jnp.float32)
    )
    o_ref[...] = xn.astype(o_ref.dtype).reshape(r, w, b, co)


def fused_ddim_head_update(x, shot_a, shot_b, xt, noise, w1, b1, w2, b2,
                           wr, br, scal, fold: int = 1,
                           interpret: bool = False):
    """Heads + DDIM update in one HBM pass; returns the next carry.

    Shapes as reference_ddim_head_update. `scal` is the (8,) fp32 vector
    from ddim_step_scalars (a traced per-step value inside the scan).
    """
    b, h, w, cf = x.shape
    co = xt.shape[-1]
    r = _tile_rows(h, w * b, cf, limit_elems=TILE_ELEMS)
    w1f, w2f, wrf = _bd(w1, fold), _bd(w2, fold), _bd(wr, fold)
    row = lambda v: jnp.tile(v, fold).reshape(1, -1).astype(jnp.float32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    tile = lambda c: pl.BlockSpec((r, w, b, c), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    tp = lambda v: jnp.transpose(v, (1, 2, 0, 3))
    out_t = pl.pallas_call(
        _kernel,
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((1, N_SCALARS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            tile(cf), tile(cf), tile(cf), tile(co), tile(co),
            full(w1f.shape), full((1, w1f.shape[1])),
            full(w2f.shape), full((1, w2f.shape[1])),
            full(wrf.shape), full((1, wrf.shape[1])),
        ],
        out_specs=pl.BlockSpec((r, w, b, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, b, co), xt.dtype),
        interpret=interpret,
    )(
        scal.reshape(1, N_SCALARS),
        tp(x), tp(shot_a), tp(shot_b), tp(xt), tp(noise),
        w1f, row(b1), w2f, row(b2), wrf, row(br),
    )
    return jnp.transpose(out_t, (2, 0, 1, 3))
