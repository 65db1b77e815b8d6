"""DPM-15 generation batch sweep: does bs=16 beat the bs=8 knee?

The round-3 batch sweep pinned bs=8 as the chip's optimum for DDIM-100,
where the ~29 ms fixed per-batch cost (x_T draw, unnormalize, dispatch,
host fetch — BENCH_NOTES round-3 decomposition) is 1.5% of the batch.
At the certified production sampler (DPM-Solver++(2M), 15 steps) the
same fixed cost is ~9% of the batch, so doubling the batch is worth
~+4-7% patches/s on paper IF per-eval time stays ~2x at bs=16 (it was
2.005x in the DDIM-100 sweep). One process, all modes batched
(tunnel rule: batch A/B into one process).

Usage: python scripts/bench_dpm_batch.py [--sizes 8,16,32] [--patch 256]
Prints one JSON line per batch size.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build, make_cond, timed_samples  # noqa: E402
from noisediff_tpu.diffusion import GaussianDiffusion  # noqa: E402
from noisediff_tpu.ops.schedules import make_schedule  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8,16,32")
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--spacing", default="time", choices=("time", "lambda"))
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    s = args.patch
    rng = jax.random.PRNGKey(0)
    os.environ["NOISEDIFF_PACKED_HEADS"] = "1"
    results = []
    for b in (int(x) for x in args.sizes.split(",")):
        model, apply_fn, params = build(48, s, jnp.bfloat16, batch=b)
        gd = GaussianDiffusion(
            apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
            image_size=s, objective="pred_v",
        )
        cond = make_cond(b, s, rng)
        fold = model.effective_fold(s)
        fn = jax.jit(
            lambda p, r, c, _b=b, _gd=gd, _f=fold: _gd.dpm_solver_sample(
                p, r, (_b, s, s, 4), c,
                sampling_timesteps=args.steps, fold_io=_f,
                step_spacing=args.spacing,
            ).astype(jnp.float32).mean()
        )
        try:
            ts = sorted(timed_samples(fn, params, rng, cond,
                                      repeats=args.repeats))
            t = ts[len(ts) // 2]
            rec = {
                "batch": b, "patch": s, "dpm_steps": args.steps,
                "spacing": args.spacing,
                "patches_per_sec": round(b / t, 3),
                "batch_seconds": round(t, 4),
                "spread": round((ts[-1] - ts[0]) / t, 4),
            }
        except Exception as exc:
            rec = {"batch": b, "patch": s, "error": str(exc)[:200]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
