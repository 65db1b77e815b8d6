"""Microbench: init_conv (7x7, cin 4) wgrad formulations at crop 512.

The folded init conv is [7,5,8,96] over a [4,512,256,8] input: with only 8
input channels XLA's wgrad-as-convolution runs the MXU at 8/128 lane
occupancy (profiled: init_conv/conv costs 8.3 ms/step of which the fwd
roofline is <1 ms; the input needs no dgrad — it is data). Candidates:
(a) autodiff, (b) one im2col patches matmul ([m, taps*cin] x [m, cout] —
fills the MXU rows with taps instead of starving on cin), (c) one einsum
per tap.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA cache: the env var does not reach jax.config on this
# runtime — utils/compilation_cache.enable() sets it programmatically
from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402
_enable_cache()

import jax
import jax.numpy as jnp

B, H, W, CIN, COUT = 4, 512, 256, 8, 96
KH, KW = 7, 5
DT = jnp.bfloat16


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def make_variant(wgrad):
    @jax.custom_vjp
    def f(x, k):
        return conv(x, k.astype(x.dtype))

    def fwd(x, k):
        return f(x, k), (x, k)

    def bwd(res, g):
        x, k = res
        return jnp.zeros_like(x), wgrad(x, g).astype(k.dtype)

    f.defvjp(fwd, bwd)
    return f


def wgrad_patches(x, g):
    b, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (KH // 2, KH // 2), (KW // 2, KW // 2), (0, 0)))
    cols = [
        jax.lax.slice(xp, (0, i, j, 0), (b, i + h, j + w, cin))
        for i in range(KH)
        for j in range(KW)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * w, KH * KW * cin)
    g2 = g.reshape(b * h * w, -1)
    dk = jnp.einsum("mk,mo->ko", patches, g2, preferred_element_type=jnp.float32)
    return dk.reshape(KH, KW, cin, g.shape[-1])


def wgrad_taps(x, g):
    b, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (KH // 2, KH // 2), (KW // 2, KW // 2), (0, 0)))
    rows = []
    for i in range(KH):
        row = []
        for j in range(KW):
            xs = jax.lax.slice(xp, (0, i, j, 0), (b, i + h, j + w, cin))
            row.append(
                jnp.einsum("bhwi,bhwo->io", xs, g,
                           preferred_element_type=jnp.float32)
            )
        rows.append(jnp.stack(row, 0))
    return jnp.stack(rows, 0)


def grad_k(fn):
    def g(x, k):
        def loss(k):
            y = fn(x, k)
            return (y.astype(jnp.float32) ** 2).sum() * 0.5

        return jax.grad(loss)(k)

    return g


def chained(g, K):
    @jax.jit
    def run(x, k):
        def body(carry, _):
            dk = g(x, carry)
            return (carry + 1e-6 * dk).astype(carry.dtype), dk.mean()

        k2, dks = jax.lax.scan(body, k, None, length=K)
        return k2.astype(jnp.float32).mean() + dks.sum()

    return run


def timed(g, x, k, n1=2, n2=10):
    r1, r2 = chained(g, n1), chained(g, n2)
    float(r1(x, k)); float(r2(x, k))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); float(r2(x, k)); tb = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r1(x, k)); ta = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return best


def main():
    import numpy as np

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, CIN), DT)
    k = jax.random.normal(rng, (KH, KW, CIN, COUT), jnp.float32) * 0.05

    def f_auto(x, kk):
        return conv(x, kk.astype(x.dtype))

    f_patches = make_variant(wgrad_patches)
    f_taps = make_variant(wgrad_taps)

    dk0 = jax.jit(grad_k(f_auto))(x, k)
    for name, fn in (("patches", f_patches), ("taps", f_taps)):
        dk = jax.jit(grad_k(fn))(x, k)
        a = np.asarray(dk, np.float32).ravel()
        b = np.asarray(dk0, np.float32).ravel()
        rel = np.abs(a - b).max() / (np.abs(b).mean() + 1e-9)
        assert rel < 0.1, (name, rel)
    print("parity ok (bf16 sanity)", flush=True)

    for name, fn in (
        ("autodiff-wgrad   ", f_auto),
        ("patches-matmul   ", f_patches),
        ("per-tap-einsum   ", f_taps),
    ):
        t = timed(grad_k(fn), x, k)
        print(f"{name}: {t * 1e3:.3f} ms/wgrad-eval", flush=True)


if __name__ == "__main__":
    main()
