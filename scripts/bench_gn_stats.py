"""Microbench GroupNorm stats formulations on the TPU (scan-delta timing).

The train-step profile (round 3) shows the per-(batch,channel) stats
reduces s_c = sum_hw x, sq_c = sum_hw x^2 costing ~1.25 ms each at the
crop-512 full-res shape (4,512,256,96) — ~16x off the HBM roofline
("AllBatchInSubla" fusion kind). Candidates reformulate the reduction as
MXU contractions (exact products: bf16 multiplies are exact in the f32
accumulator; only summation order changes, rel err ~1e-6).

Chained single dispatches on the tunnel have a ~0.9 ms floor, so each
formulation runs inside lax.scan and the cost is the K2-vs-K1 delta.

Usage: python scripts/bench_gn_stats.py [--shape 4,512,256,96]
"""
import argparse
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
from jax import lax


def scan_delta_ms(fn, x, k1=8, k2=40, reps=3):
    """Per-iteration device ms of fn(x)->(s,q) via scan-length delta."""

    def make(k):
        def body(c, _):
            s, q = fn(c)
            # data dependence: fold a scalar of the result back into the
            # carry so XLA cannot hoist or DCE the stats computation
            bump = (s[0, 0] + q[0, 0]).astype(c.dtype) * jnp.bfloat16(1e-24)
            return c + bump, None

        return jax.jit(lambda xx: lax.scan(body, xx, None, length=k)[0])

    f1, f2 = make(k1), make(k2)

    def run(f):
        out = f(x)
        return float(jnp.asarray(out[0, 0, 0, 0]).astype(jnp.float32))

    run(f1), run(f2)  # compile
    best = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f1); t1 = time.perf_counter()
        run(f2); t2 = time.perf_counter()
        best.append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3)
    return min(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,512,256,96")
    args = ap.parse_args()
    b, h, w, c = [int(s) for s in args.shape.split(",")]

    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)

    def current(x):
        xf = x.astype(jnp.float32)
        return xf.sum(axis=(1, 2)), (xf * xf).sum(axis=(1, 2))

    def two_stage(x):
        xf = x.astype(jnp.float32)
        return xf.sum(1).sum(1), (xf * xf).sum(1).sum(1)

    def reduce_w_then_h(x):
        xf = x.astype(jnp.float32)
        return xf.sum(2).sum(1), (xf * xf).sum(2).sum(1)

    def gram_two_dots(x):
        x2 = x.reshape(b, h * w, c)
        sq = jnp.einsum("bpc,bpd->bcd", x2, x2,
                        preferred_element_type=jnp.float32)
        ones = jnp.ones((b, h * w), x.dtype)
        s = jnp.einsum("bpc,bp->bc", x2, ones,
                       preferred_element_type=jnp.float32)
        return s, jnp.diagonal(sq, axis1=1, axis2=2)

    def gram_augmented(x):
        x2 = x.reshape(b, h * w, c)
        xa = jnp.concatenate([x2, jnp.ones((b, h * w, 1), x.dtype)], -1)
        g = jnp.einsum("bpc,bpd->bcd", xa, x2,
                       preferred_element_type=jnp.float32)
        return g[:, c, :], jnp.diagonal(g[:, :c, :], axis1=1, axis2=2)

    ref = jax.jit(current)(x)
    for name, fn in [
        ("current_reduce", current),
        ("two_stage_reduce", two_stage),
        ("reduce_w_then_h", reduce_w_then_h),
        ("gram_two_dots", gram_two_dots),
        ("gram_augmented", gram_augmented),
    ]:
        out = jax.jit(fn)(x)
        err = max(
            float(jnp.max(jnp.abs(a - r)) / (jnp.max(jnp.abs(r)) + 1e-9))
            for a, r in zip(out, ref)
        )
        dt = scan_delta_ms(fn, x)
        print(f"{name:20s} {dt:8.3f} ms   rel_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
