"""Decompose generation-step time on the TPU: bare UNet forward vs full DDIM
step, per-stage conv throughput, and bf16 vs fp32. Run on the TPU host:

    python scripts/profile_unet.py [--batch 8] [--patch 256]
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

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule


def timed(fn, *args, n=10):
    """Per-call seconds with a host value-fetch sync each iteration.

    block_until_ready returns early on the axon-tunneled runtime
    (BENCH_NOTES.md), so timing must fetch a scalar from the result."""

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return float(jnp.asarray(leaf).astype(jnp.float32).sum())

    fetch(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=48)
    args = ap.parse_args()
    b, s = args.batch, args.patch

    for dtype, tag in ((jnp.bfloat16, "bf16"), (None, "fp32")):
        model = NoiseDiffNet(dim=args.dim, dtype=dtype)
        x = jnp.zeros((b, s, s, 4), jnp.float32)
        t = jnp.zeros((b,), jnp.int32)
        cond = {
            "clean_img": jnp.zeros((b, s, s, 4), jnp.float32),
            "position": jnp.zeros((b, s, s, 2), jnp.float32),
            "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
        }
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]

        fwd = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
        dt = timed(fwd, params, x, t, cond)
        print(f"UNet forward {tag}: {dt*1e3:.2f} ms/batch  "
              f"({dt*1e3/b:.2f} ms/sample)")

        def apply_fn(p, xx, tt, condition):
            return model.apply({"params": p}, xx, tt, condition)

        gd = GaussianDiffusion(
            apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
            image_size=s, objective="pred_v",
        )
        step2 = jax.jit(
            lambda p, r, c: gd.ddim_sample(p, r, (b, s, s, 4), c, sampling_timesteps=2)
        )
        dt2 = timed(step2, params, jax.random.PRNGKey(0), cond, n=5)
        print(f"DDIM 2-step {tag}: {dt2*1e3:.2f} ms -> per-step "
              f"{dt2*1e3/2:.2f} ms (sampler overhead vs forward: "
              f"{(dt2/2 - dt)*1e3:.2f} ms)")

    # raw conv throughput at the model's dominant shapes
    for (hw, cin, cout) in ((s, 48, 48), (s // 2, 96, 96), (s // 4, 192, 192), (s // 8, 384, 384)):
        xx = jnp.zeros((b, hw, hw, cin), jnp.bfloat16)
        kk = jnp.zeros((3, 3, cin, cout), jnp.bfloat16)
        conv = jax.jit(
            lambda x, k: jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        )
        dt = timed(conv, xx, kk)
        flops = 2 * b * hw * hw * 9 * cin * cout
        print(f"conv3x3 {hw}x{hw}x{cin}->{cout} bf16: {dt*1e3:.3f} ms, "
              f"{flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
