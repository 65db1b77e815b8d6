"""Pallas TPU flash attention (non-causal, full bidirectional).

TPU-native replacement for the reference's torch-SDPA `Attend` wrapper
(models/attend.py:35-116 — which explicitly *disables* flash on CUDA and
falls back to math attention). Used by models.blocks.Attention for the
bottleneck full self-attention (4096+ tokens at the 512-crop /8 resolution)
and available to CrossAttention's multi-token path.

Classic tiled online-softmax: the (N, N) score matrix is never materialised;
q-tiles stay resident in VMEM while k/v-tiles stream through, maintaining
running max / normaliser / weighted accumulation. Matmuls hit the MXU with
fp32 accumulation; tile sizes are multiples of the (8, 128) fp32 tiling.

Backward runs the reference jnp formulation under custom_vjp (training
recomputes; generation — the throughput path — only needs the forward).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _attention_reference(q, k, v, scale):
    """jnp reference (also the custom-VJP backward path)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_kv = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(
    q, k, v, scale, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=False
):
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    bq = min(block_q, q_len)
    bk = min(block_k, kv_len)
    if q_len % bq or kv_len % bk:
        # ragged lengths: fall back (generation shapes are powers of two)
        return _attention_reference(q, k, v, scale)

    qf = q.reshape(b * h, q_len, d)
    kf = k.reshape(b * h, kv_len, d)
    vf = v.reshape(b * h, kv_len, d)

    kernel = functools.partial(_flash_kernel, scale=scale, block_k=bk, kv_len=kv_len)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, q_len // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, q_len, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * q_len * kv_len * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * q_len * kv_len,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, q_len, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, Nq, D) x (B, H, Nk, D) -> (B, H, Nq, D), softmax(q k^T / sqrt(D)) v."""
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _flash_forward(q, k, v, scale, interpret=interpret)


def _fwd(q, k, v, scale, interpret):
    scale_ = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _flash_forward(q, k, v, scale_, interpret=interpret), (q, k, v)


def _bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    scale_ = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])

    def ref(q, k, v):
        return _attention_reference(q, k, v, scale_)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
