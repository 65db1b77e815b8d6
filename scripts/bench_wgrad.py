"""Microbench: folded-3x3-conv backward formulations at the crop-512 stage.

BENCH_NOTES (round 4): the train step's wgrad convs of the folded 3x3
layers lower into activation-sized masked-select fusions (~1 ms each).
Hypothesis: computing the gradients in the UNFOLDED domain (the fold is a
pure bitcast reshape in NHWC row-major, so the unfolded grads are exact)
avoids the masked-select rewrite of the fold selector's einsum transpose
AND the fold's 2x zero-padded backward FLOPs.

Measures fwd+bwd of 0.5*sum(conv(x)^2) chained K times inside one jit
(scan-delta: K=10 vs K=2, so tunnel dispatch cancels) for:
(a) folded autodiff (today's path), (b) unfolded autodiff (no fold),
(c) folded fwd + custom unfolded bwd.
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def folded_conv(x, kernel, fold):
    kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold)
    return conv(x, kf.astype(x.dtype))


def _fc_fwd(x, kernel, fold):
    return folded_conv(x, kernel, fold), (x, kernel)


def _fc_bwd(fold, res, g):
    x, kernel = res
    xu = unfold_width(x, fold)
    gu = unfold_width(g, fold)

    def f(xx, k):
        return conv(xx, k.astype(xx.dtype))

    _, vjp = jax.vjp(f, xu, kernel)
    dxu, dk = vjp(gu)
    return fold_width(dxu, fold), dk


folded_conv.defvjp(_fc_fwd, _fc_bwd)


def grad_step(loss_fn):
    def g(x, k):
        def f(x, k):
            y = loss_fn(x, k)
            return (y.astype(jnp.float32) ** 2).sum() * 0.5

        return jax.grad(f, argnums=(0, 1))(x, k)

    return g


def chained(g, K):
    """K grad evals with a data dependency so XLA can't dedup them."""

    @jax.jit
    def run(x, k):
        def body(carry, _):
            dx, dk = g(carry, k)
            return (carry + 1e-6 * dx).astype(carry.dtype), dk.mean()
        x2, dks = jax.lax.scan(body, x, None, length=K)
        return x2.astype(jnp.float32).mean() + dks.sum()

    return run


def timed_scan_delta(g, x, k, n1=2, n2=10):
    r1, r2 = chained(g, n1), chained(g, n2)
    float(r1(x, k)); float(r2(x, k))  # compile + warm
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); float(r2(x, k)); tb = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r1(x, k)); ta = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return best


def main():
    rng = jax.random.PRNGKey(0)
    k = jax.random.normal(rng, (3, 3, C, C), jnp.float32) * 0.05
    xu = jax.random.normal(rng, (B, H, W, C), DT)
    xf = fold_width(xu, 2)

    def f_folded(x, kk):
        kf = _fold_conv_kernel(kk, (C,), 2)
        return conv(x, kf.astype(x.dtype))

    def f_unfolded(x, kk):
        return conv(x, kk.astype(x.dtype))

    def f_custom(x, kk):
        return folded_conv(x, kk, 2)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def taps_conv(x, kernel, fold):
        kf = _fold_conv_kernel(kernel, (kernel.shape[2],), fold)
        return conv(x, kf.astype(x.dtype))

    def _taps_fwd(x, kernel, fold):
        return taps_conv(x, kernel, fold), (x, kernel)

    def _taps_bwd(fold, res, g):
        # wgrad as 9 tall-skinny matmuls (one per kernel tap) instead of
        # XLA's padded-window wgrad conv; dgrad stays a plain conv; the
        # fold-selector transpose applies to the tiny folded kernel grad
        x, kernel = res
        cin = kernel.shape[2]
        kf = _fold_conv_kernel(kernel, (cin,), fold)
        kT = jnp.flip(kf, (0, 1)).swapaxes(2, 3)
        dx = conv(g, kT.astype(g.dtype))
        b, h, w, cf = x.shape
        kh, kw = kf.shape[0], kf.shape[1]
        xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
        rows = []
        for i in range(kh):
            row = []
            for j in range(kw):
                xs = jax.lax.slice(xp, (0, i, j, 0), (b, i + h, j + w, cf))
                row.append(
                    jnp.einsum(
                        "bhwi,bhwo->io", xs, g,
                        preferred_element_type=jnp.float32,
                    )
                )
            rows.append(jnp.stack(row, 0))
        dkf = jnp.stack(rows, 0)
        _, vjpk = jax.vjp(
            lambda kk: _fold_conv_kernel(kk, (cin,), fold), kernel
        )
        (dk,) = vjpk(dkf.astype(kernel.dtype))
        return dx, dk

    taps_conv.defvjp(_taps_fwd, _taps_bwd)

    def f_taps(x, kk):
        return taps_conv(x, kk, 2)

    def f_pallas(x, kk):
        # round-4 streaming Pallas wgrad (ops/pallas/conv_wgrad.py)
        from noisediff_tpu.models.blocks import _conv_same_pallas_wgrad

        return _conv_same_pallas_wgrad(x, kk, 2, "tpu")

    def f_kbarrier(x, kk):
        # barrier the FOLDED kernel: autodiff then computes the folded-domain
        # wgrad as a plain conv and applies the fold-selector transpose to the
        # small [kh,kw',2C,2C] kernel grad instead of fusing it into the wgrad
        # as activation-sized masked selects
        kf = jax.lax.optimization_barrier(_fold_conv_kernel(kk, (C,), 2))
        return conv(x, kf.astype(x.dtype))

    # numeric parity first
    import numpy as np

    # loose sanity only: bf16 grads at ~1e5 magnitude reassociate differently
    # between the two lowerings; exact parity is pinned in fp32 by
    # tests/test_lane_fold.py::test_folded_conv_unfold_bwd_parity
    dxf, dkf = jax.jit(grad_step(f_folded))(xf, k)
    dxc, dkc = jax.jit(grad_step(f_custom))(xf, k)
    dxt, dkt = jax.jit(grad_step(f_taps))(xf, k)
    for a, b, tag in (
        (dkc, dkf, "dk"), (dxc, dxf, "dx"),
        (dkt, dkf, "dk-taps"), (dxt, dxf, "dx-taps"),
    ):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        rel = np.abs(a - b) / (np.abs(b).mean() + 1e-9)
        assert rel.max() < 0.1, (tag, rel.max())
    print("parity ok (bf16 sanity)", flush=True)

    only = os.environ.get("BENCH_WGRAD_ONLY", "")
    variants = (
        ("folded-autodiff    ", f_folded, xf),
        ("unfolded-autodiff  ", f_unfolded, xu),
        ("custom-unfold-bwd  ", f_custom, xf),
        ("folded-kernel-bar  ", f_kbarrier, xf),
        ("per-tap-einsum-bwd ", f_taps, xf),
        ("pallas-stream-wgrad", f_pallas, xf),
    )
    for name, fn, x in variants:
        if only and only not in name:
            continue
        t = timed_scan_delta(grad_step(fn), x, k)
        print(f"{name}: {t * 1e3:.3f} ms/grad-eval", flush=True)


if __name__ == "__main__":
    main()
