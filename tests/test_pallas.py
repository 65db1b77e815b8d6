"""Pallas flash-attention tests (interpret mode on the CPU backend; the same
kernel compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from noisediff_tpu.ops.pallas.flash_attention import (
    _attention_reference,
    flash_attention,
)


def _qkv(b=2, h=2, n=512, d=64, seed=0, dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, n, d), dtype)
    k = jax.random.normal(kk, (b, h, n, d), dtype)
    v = jax.random.normal(kv, (b, h, n, d), dtype)
    return q, k, v


def test_flash_matches_reference():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, None, True)  # interpret mode
    ref = _attention_reference(q, k, v, 1.0 / np.sqrt(q.shape[-1]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_multiple_k_blocks():
    # kv_len spans 2 k-tiles of 256 -> exercises the online-softmax carry
    q, k, v = _qkv(b=1, h=1, n=512, d=32, seed=1)
    out = flash_attention(q, k, v, None, True)
    ref = _attention_reference(q, k, v, 1.0 / np.sqrt(32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_custom_scale_and_ragged_fallback():
    q, k, v = _qkv(b=1, h=1, n=100, d=16, seed=2)  # 100 not tile-aligned
    out = flash_attention(q, k, v, 0.3, True)
    ref = _attention_reference(q, k, v, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_gradient_matches_reference():
    q, k, v = _qkv(b=1, h=1, n=256, d=32, seed=3)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, None, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_attention_reference(q, k, v, 1.0 / np.sqrt(32)) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_flash_bf16():
    q, k, v = _qkv(b=1, h=1, n=256, d=64, seed=4, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, None, True)
    ref = _attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        1.0 / np.sqrt(64),
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
