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

# per-program VMEM budget for the resident input+output blocks (bytes);
# v5e has 128 MiB VMEM — leave room for double-buffering across grid steps
VMEM_BUDGET = 32 * 1024 * 1024


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


def _dot(a, b):
    # fp32 matmul: the TPU default precision truncates f32 operands to bf16,
    # which is catastrophic for the stats reductions here
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chunk_rows(n: int, c: int) -> int:
    """Largest row-chunk dividing n whose fp32 working set stays ~1 MiB."""
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0 and t * c * 4 <= (1 << 20):
            return t
    return n


def _kernel(
    x_ref, gamma_ref, beta_ref, fs_ref, fsh_ref, mask_ref, o_ref, *, eps, n_cg, chunk
):
    """One batch row (N, C) resident in VMEM in the input dtype; fp32
    intermediates are streamed in `chunk`-row slices so the scoped (stack)
    VMEM stays ~1 MiB regardless of N. Three VMEM sweeps (sums, centered
    square-sums, apply) — still a single HBM pass."""
    n, c = x_ref.shape[1], x_ref.shape[2]
    nchunks = n // chunk
    mask = mask_ref[...]  # (C, G)

    def body_sum(i, acc):
        sl = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return acc + jnp.sum(sl, axis=0, keepdims=True)

    s = jax.lax.fori_loop(0, nchunks, body_sum, jnp.zeros((1, c), jnp.float32))
    mean_c = _dot(_dot(s, mask) / n_cg, mask.T)  # (1, C)

    def body_sq(i, acc):
        sl = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32) - mean_c
        return acc + jnp.sum(sl * sl, axis=0, keepdims=True)

    sq = jax.lax.fori_loop(0, nchunks, body_sq, jnp.zeros((1, c), jnp.float32))
    inv_c = _dot(jax.lax.rsqrt(_dot(sq, mask) / n_cg + eps), mask.T)

    ga, be = gamma_ref[...], beta_ref[...]
    fs, fsh = fs_ref[0], fsh_ref[0]

    def body_out(i, carry):
        sl = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = ((sl - mean_c) * inv_c) * ga + be
        y = y * (fs + 1.0) + fsh
        o_ref[0, pl.ds(i * chunk, chunk), :] = (y * jax.nn.sigmoid(y)).astype(
            o_ref.dtype
        )
        return carry

    jax.lax.fori_loop(0, nchunks, body_out, 0)


def _forward(x, gamma, beta, film_scale, film_shift, groups, eps, interpret):
    b, n, c = x.shape
    if film_scale is None:
        film_scale = jnp.zeros((b, c), jnp.float32)
        film_shift = jnp.zeros((b, c), jnp.float32)
    mask = jnp.asarray(
        np.kron(np.eye(groups, dtype=np.float32), np.ones((c // groups, 1), np.float32))
    )  # (C, G)
    n_cg = float(n * (c // groups))

    kernel = functools.partial(_kernel, eps=eps, n_cg=n_cg, chunk=_chunk_rows(n, c))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # film rows as (1, 1, c) blocks of a (b, 1, c) array: Mosaic
            # requires the last two block dims to divide (8, 128) or equal
            # the array dims — a (1, c) slice of (b, c) satisfies neither.
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(
        x,
        gamma.reshape(1, c).astype(jnp.float32),
        beta.reshape(1, c).astype(jnp.float32),
        film_scale.reshape(b, 1, c).astype(jnp.float32),
        film_shift.reshape(b, 1, c).astype(jnp.float32),
        mask,
    )


def fits_vmem(n: int, c: int, itemsize: int = 4) -> bool:
    # input block + output block resident per program
    return n * c * itemsize * 2 <= VMEM_BUDGET


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
