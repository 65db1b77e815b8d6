"""Profile the crop-512 diffusion train step (the bench.py stage-1 config):
trace N steps with jax.profiler, dump compiled HLO, and print the per-step
device time so scripts/xprof_join_hlo.py can aggregate per-layer costs.

Usage:
    python scripts/profile_train.py [--trace /tmp/ttrace] [--steps 4]
    python scripts/xprof_join_hlo.py /tmp/ttrace /tmp/train_hlo.txt --evals 4
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

from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule
from noisediff_tpu.diffusion.gaussian import GaussianDiffusion
from noisediff_tpu.train.state import (
    create_train_state,
    make_diffusion_train_step,
    make_optimizer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/ttrace")
    ap.add_argument("--hlo", default="/tmp/train_hlo.txt")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    s, b = args.crop, args.batch
    rng = jax.random.PRNGKey(0)
    model = NoiseDiffNet(dim=48, dtype=jnp.bfloat16, remat=False)
    x = jnp.zeros((b, s, s, 4), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    cond = {
        "clean_img": jax.random.uniform(rng, (b, s, s, 4)),
        "position": jax.random.uniform(rng, (b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, c):
        return model.apply({"params": p}, xx, tt, c)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
        image_size=s, objective="pred_v",
    )
    opt = make_optimizer()
    state = create_train_state(params, opt, with_ema=True)
    step = jax.jit(make_diffusion_train_step(gd, opt), donate_argnums=0)
    batch = {
        "noise": jax.random.normal(rng, (b, s, s, 4)) * 0.1,
        "clean_img": cond["clean_img"],
        "coord": cond["position"],
        "iso_ratio_idx": cond["iso_ratio_idx"],
    }

    # HLO dump for the join
    lowered = jax.jit(make_diffusion_train_step(gd, opt)).lower(
        state, batch, rng
    )
    with open(args.hlo, "w") as f:
        f.write(lowered.compile().as_text())
    print(f"hlo -> {args.hlo}", flush=True)

    # warmup (compile)
    state, m = step(state, batch, rng)
    key = "diffusion_loss" if "diffusion_loss" in m else "loss_sum"
    float(m[key])
    state, m = step(state, batch, rng)
    float(m[key])

    jax.profiler.start_trace(args.trace)
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    float(m[key])
    jax.profiler.stop_trace()
    print(f"trace ({args.steps} steps) -> {args.trace}", flush=True)

    # scan-free wall clock estimate for reference (dispatch-dominated on
    # the tunnel; the trace numbers are the trustworthy ones)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    float(m[key])
    print(f"wall {(time.perf_counter()-t0)/args.steps*1e3:.1f} ms/step "
          "(incl dispatch)", flush=True)


if __name__ == "__main__":
    main()
