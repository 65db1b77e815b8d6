"""Headline-sampler sweep: batch size x scan unroll on the real chip.

Times the production DDIM generation configuration (bf16, lane-folded,
packed heads, fold_io carry) across batch sizes and NOISEDIFF_SCAN_UNROLL
values to find the chip's patches/s optimum. The headline metric is
patches/s/chip with batch a free parameter (BASELINE.md), so a better
batch is a legitimate headline improvement — bench.py's BENCH_BATCH env
knob consumes the winner.

Usage: python scripts/bench_headline_sweep.py [--steps 25] [--batches 8,16,32]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("NOISEDIFF_PACKED_HEADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA cache: the env var does not reach jax.config on this
# runtime — utils/compilation_cache.enable() sets it programmatically
from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402
_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--unrolls", default="1,2")
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from noisediff_tpu.diffusion import GaussianDiffusion
    from noisediff_tpu.ops.schedules import make_schedule

    rng = jax.random.PRNGKey(0)
    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        model, apply_fn, params = bench.build(48, args.patch, jnp.bfloat16, batch=b)
        gd = GaussianDiffusion(
            apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
            image_size=args.patch, objective="pred_v",
        )
        cond = bench.make_cond(b, args.patch, rng)
        shape = (b, args.patch, args.patch, 4)
        fold_io = model.effective_fold(args.patch)
        for unroll in [int(u) for u in args.unrolls.split(",")]:
            os.environ["NOISEDIFF_SCAN_UNROLL"] = str(unroll)
            sample = jax.jit(
                lambda p, r, c: gd.ddim_sample(
                    p, r, shape, c, sampling_timesteps=args.steps,
                    fold_io=fold_io,
                ).astype(jnp.float32).mean()
            )
            try:
                t = bench.timed_fetch(sample, params, rng, cond,
                                      repeats=args.repeats)
            except Exception as exc:
                results.append({"batch": b, "unroll": unroll,
                                "error": str(exc)[:160]})
                print(json.dumps(results[-1]), flush=True)
                continue
            row = {
                "batch": b,
                "unroll": unroll,
                "steps": args.steps,
                "batch_seconds": round(t, 4),
                "ms_per_eval": round(t / args.steps * 1e3, 3),
                "patches_per_sec_at_100": round(b / (t * 100 / args.steps), 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
