"""Fused GroupNorm + FiLM + SiLU Pallas kernel.

The conv -> GroupNorm -> FiLM(scale+1, shift) -> SiLU chain is the body of
every ResnetBlock (blocks.Block, reference Diffusion_arch.py:128-144). A
generic two-pass GN costs two HBM reads of the activation; this kernel keeps
one batch row's (H*W, C) block resident in VMEM and does stats + normalise +
affine + FiLM + SiLU in a single pass.

Group reductions use the MXU: with a (C, groups) one-hot mask M,
  group_sums = colsum(x) @ M,  group_sqsums = colsum(x*x) @ M,
and the per-channel broadcast back is M @ stats — no lane-hostile reshapes
of the channel axis (C=48 with 6-channel groups would otherwise shuffle
within the 128-lane dimension).

Used when the per-sample block fits VMEM (all UNet stages at crop 256 in
bf16; the /2.. /8 stages at crop 512). Backward = jnp reference under
custom_vjp (recompute).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget for the activation block (bytes)
VMEM_BUDGET = 8 * 1024 * 1024


def _reference(x, gamma, beta, film_scale, film_shift, groups, eps):
    b, n, c = x.shape
    xg = x.reshape(b, n, groups, c // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, n, c).astype(x.dtype)
    y = y * gamma + beta
    if film_scale is not None:
        y = y * (film_scale[:, None, :] + 1.0) + film_shift[:, None, :]
    return y * jax.nn.sigmoid(y)


def _kernel(x_ref, gamma_ref, beta_ref, fs_ref, fsh_ref, mask_ref, o_ref, *, eps, n_cg):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    mask = mask_ref[...]  # (C, G)
    s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    gs = jax.lax.dot_general(  # (1, G)
        s, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    gsq = jax.lax.dot_general(
        sq, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mean_g = gs / n_cg
    var_g = gsq / n_cg - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(
        mean_g, mask.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    inv_c = jax.lax.dot_general(
        inv_g, mask.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = (x - mean_c) * inv_c
    y = y * gamma_ref[...] + beta_ref[...]
    y = y * (fs_ref[...] + 1.0) + fsh_ref[...]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _forward(x, gamma, beta, film_scale, film_shift, groups, eps, interpret):
    b, n, c = x.shape
    if film_scale is None:
        film_scale = jnp.zeros((b, c), jnp.float32)
        film_shift = jnp.zeros((b, c), jnp.float32)
    mask = jnp.asarray(
        np.kron(np.eye(groups, dtype=np.float32), np.ones((c // groups, 1), np.float32))
    )  # (C, G)
    n_cg = float(n * (c // groups))

    kernel = functools.partial(_kernel, eps=eps, n_cg=n_cg)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(
        x,
        gamma.reshape(1, c).astype(jnp.float32),
        beta.reshape(1, c).astype(jnp.float32),
        film_scale.astype(jnp.float32),
        film_shift.astype(jnp.float32),
        mask,
    )


def fits_vmem(n: int, c: int, itemsize: int = 4) -> bool:
    return n * c * itemsize <= VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_groupnorm_film_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    film_scale: Optional[jnp.ndarray],
    film_shift: Optional[jnp.ndarray],
    groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, N, C) tokens; gamma/beta: (C,); film_*: (B, C) or None.

    Returns silu(GN(x) * gamma + beta, then FiLM'd). Single-HBM-pass Pallas
    kernel; caller is responsible for the fits_vmem check.
    """
    return _forward(x, gamma, beta, film_scale, film_shift, groups, eps, interpret)


def _fwd(x, gamma, beta, film_scale, film_shift, groups, eps, interpret):
    out = _forward(x, gamma, beta, film_scale, film_shift, groups, eps, interpret)
    return out, (x, gamma, beta, film_scale, film_shift)


def _bwd(groups, eps, interpret, residuals, g):
    x, gamma, beta, film_scale, film_shift = residuals

    def ref(x, gamma, beta, fs, fsh):
        return _reference(x, gamma, beta, fs, fsh, groups, eps)

    if film_scale is None:
        def ref2(x, gamma, beta):
            return _reference(x, gamma, beta, None, None, groups, eps)

        _, vjp = jax.vjp(ref2, x, gamma, beta)
        dx, dg, db = vjp(g)
        return dx, dg, db, None, None
    _, vjp = jax.vjp(ref, x, gamma, beta, film_scale, film_shift)
    return vjp(g)


fused_groupnorm_film_silu.defvjp(_fwd, _bwd)
