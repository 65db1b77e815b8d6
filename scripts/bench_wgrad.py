"""Microbench: folded-3x3-conv backward formulations at the crop-512 stage.

BENCH_NOTES (round 4): the train step's wgrad convs of the folded 3x3
layers lower into activation-sized masked-select fusions (~1 ms each).
Hypothesis: computing the weight gradient in the UNFOLDED domain (the fold
is a pure reindexing, so the unfolded wgrad is the exact gradient of the
unfolded kernel) avoids the masked-select rewrite of the fold selector's
einsum transpose, at the cost of two unfold reshapes of activation tensors.

Measures fwd+bwd of sum(conv(x)) for: (a) folded autodiff (today's path),
(b) unfolded autodiff (no fold), (c) folded fwd + custom unfolded wgrad.
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/noisediff_jax_cache_tpu")

import jax
import jax.numpy as jnp

from noisediff_tpu.models.blocks import (
    _fold_conv_kernel,
    fold_width,
    unfold_width,
)

B, H, W, C = 4, 512, 512, 48
DT = jnp.bfloat16


def conv(x, k, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timed(fn, *args, repeats=3):
    jax.block_until_ready(fn(*args))
    float(jnp.asarray(fn(*args)[0]).sum())  # fetch sync (axon tunnel)
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r[0]).sum())
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def folded_conv(x, kernel, fold):
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold)
    return conv(x, kf.astype(x.dtype))


def _fc_fwd(x, kernel, fold):
    return folded_conv(x, kernel, fold), (x, kernel)


def _fc_bwd(fold, res, g):
    x, kernel = res
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold)

    def fx(xx):
        return conv(xx, kf.astype(xx.dtype))

    _, vjp_x = jax.vjp(fx, x)
    (dx,) = vjp_x(g)

    xu = unfold_width(x, fold)
    gu = unfold_width(g, fold)

    def fk(k):
        return conv(xu, k.astype(xu.dtype))

    _, vjp_k = jax.vjp(fk, kernel)
    (dk,) = vjp_k(gu)
    return dx, dk


folded_conv.defvjp(_fc_fwd, _fc_bwd)


def main():
    rng = jax.random.PRNGKey(0)
    k = jax.random.normal(rng, (3, 3, C, C), jnp.float32) * 0.05
    xu = jax.random.normal(rng, (B, H, W, C), DT)
    xf = fold_width(xu, 2)

    @jax.jit
    def g_folded(x, kk):
        def f(x, kk):
            kf = _fold_conv_kernel(kk, (C,), 2)
            return (conv(x, kf.astype(x.dtype)).astype(jnp.float32)).sum()

        return jax.grad(f, argnums=(0, 1))(x, kk)

    @jax.jit
    def g_unfolded(x, kk):
        def f(x, kk):
            return (conv(x, kk.astype(x.dtype)).astype(jnp.float32)).sum()

        return jax.grad(f, argnums=(0, 1))(x, kk)

    @jax.jit
    def g_custom(x, kk):
        def f(x, kk):
            return folded_conv(x, kk, 2).astype(jnp.float32).sum()

        return jax.grad(f, argnums=(0, 1))(x, kk)

    # numeric parity first
    dxf, dkf = g_folded(xf, k)
    dxc, dkc = g_custom(xf, k)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(dkc), np.asarray(dkf), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(dxc, np.float32), np.asarray(dxf, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    print("parity ok", flush=True)

    for name, fn, x in (
        ("folded-autodiff ", g_folded, xf),
        ("unfolded-autodiff", g_unfolded, xu),
        ("custom-unfold-wgrad", g_custom, xf),
    ):
        t = timed(fn, x, k)
        print(f"{name}: {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
