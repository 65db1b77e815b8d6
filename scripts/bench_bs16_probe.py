"""Per-chip bs=16 crop-512 train-step probe (round-4 verdict Weak #5).

bench.py's in-line bs=16 leg died with an HTTP 500 from the remote
tpu_compile_helper (not a chip-side ResourceExhausted), so the remat
fallback never ran. This probe isolates the failure axis in ONE process
(tunnel rule): each mode jits the full diffusion train step at
(16, 512, 512, 4) with a different config and records steps/s or the
exact failure.

  pallas   — production config (GN-stats Pallas kernels in the train
             trace), remat off: the config bench.py tried.
  reduce   — NOISEDIFF_GN_STATS=reduce (no Pallas anywhere): does the
             compile helper survive without Mosaic?
  remat    — production GN config, model remat on: smaller live set.

Usage: python scripts/bench_bs16_probe.py [--modes pallas,reduce,remat]
Prints one JSON line per mode.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_cond  # noqa: E402
from noisediff_tpu.diffusion import GaussianDiffusion  # noqa: E402
from noisediff_tpu.models import NoiseDiffNet  # noqa: E402
from noisediff_tpu.ops.schedules import make_schedule  # noqa: E402
from noisediff_tpu.train.state import (  # noqa: E402
    create_train_state,
    make_diffusion_train_step,
    make_optimizer,
)

S, B = 512, 16


def steps_per_sec(step, state, batch, rng, n=8):
    def run(state, k):
        m = None
        for _ in range(k):
            state, m = step(state, batch, rng)
        return state, m

    s2, m = run(state, 2)  # compile + warmup chain
    float(m["diffusion_loss"])
    t0 = time.perf_counter()
    s3, m = run(s2, n)
    float(m["diffusion_loss"])
    dt_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    s4, m = run(s3, 2)
    float(m["diffusion_loss"])
    dt_2 = time.perf_counter() - t0
    return (n - 2) / max(dt_n - dt_2, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="pallas,reduce,remat")
    args = ap.parse_args(argv)

    rng = jax.random.PRNGKey(0)
    cond = make_cond(B, S, rng)
    batch = {
        "noise": jax.random.normal(rng, (B, S, S, 4)) * 0.1,
        "clean_img": cond["clean_img"],
        "coord": cond["position"],
        "iso_ratio_idx": cond["iso_ratio_idx"],
    }
    opt = make_optimizer()
    results = []
    for mode in args.modes.split(","):
        os.environ.pop("NOISEDIFF_GN_STATS", None)
        if mode == "reduce":
            os.environ["NOISEDIFF_GN_STATS"] = "reduce"
        remat = mode == "remat"
        model = NoiseDiffNet(dim=48, dtype=jnp.bfloat16, remat=remat)
        try:
            x = jnp.zeros((1, S, S, 4), jnp.float32)
            t = jnp.zeros((1,), jnp.int32)
            c1 = make_cond(1, S, rng)
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), x, t, c1
            )["params"]

            def apply_fn(p, xx, tt, c, _m=model):
                return _m.apply({"params": p}, xx, tt, c)

            gd = GaussianDiffusion(
                apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
                image_size=S, objective="pred_v",
            )
            step = make_diffusion_train_step(gd, opt, ema_in_step=False)
            state = create_train_state(params, opt, with_ema=True)
            sps = steps_per_sec(step, state, batch, rng)
            rec = {
                "mode": mode, "batch": B, "crop": S,
                "steps_per_sec": round(sps, 3),
                "samples_per_sec": round(B * sps, 2),
            }
        except Exception as exc:
            rec = {"mode": mode, "batch": B, "crop": S,
                   "error": f"{type(exc).__name__}: {exc}"[:300]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
