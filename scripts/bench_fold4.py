"""Microbench: fold-2 vs fold-4 width-fold for the LSID full-res convs.

The LSID full-frame profile shows the level-1/9 folded convs (C=32 -> 64
folded channels = 50% lane fill) executing at ~21-30 TF/s hw — far below
both the fill ceiling and the diffusion model's 96-channel folds
(~94-107 TF/s). Hypothesis: the conv emitter's per-pixel floor at C<=64
dominates; folding by 4 (128 channels, full fill) doubles the padding
FLOPs but may still win wall-clock.

Forward-only scan-delta timing at the LSID level-1 shape.
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

from noisediff_tpu.models.blocks import _fold_conv_kernel, fold_width

B, H, W, CIN, COUT = 1, 1424, 2128, 32, 32
DT = jnp.bfloat16


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timed(fn, *args, n1=2, n2=12):
    def fetch(o):
        return float(jnp.asarray(o).astype(jnp.float32).sum())

    fetch(fn(*args, n1)); fetch(fn(*args, n2))
    t0 = time.perf_counter(); fetch(fn(*args, n1)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(fn(*args, n2)); tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1) * 1e3


def main():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, CIN, COUT), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CIN)).astype(DT)
    useful_gf = 2 * B * H * W * CIN * COUT * 9 / 1e9

    for fold in (1, 2, 4):
        kf = (_fold_conv_kernel(k, (CIN,), fold) if fold > 1 else k).astype(DT)
        xf = fold_width(x, fold) if fold > 1 else x

        @functools.partial(jax.jit, static_argnums=2)
        def chain(xx, kk, n):
            def body(c, _):
                y = conv(c, kk)
                # keep C constant across iterations: feed y back (cout==cin)
                return y, ()
            out, _ = jax.lax.scan(body, xx, None, length=n)
            return out.astype(jnp.float32).mean()

        ms = timed(chain, xf, kf)
        kw_f = kf.shape[1]
        exec_gf = useful_gf * (fold * kw_f / 3)
        print(
            f"fold={fold}: {ms:.3f} ms  useful {useful_gf/ms:.1f} TF/s  "
            f"hw {exec_gf/ms:.1f} TF/s (kernel {kf.shape})"
        )


if __name__ == "__main__":
    main()
