"""A/B the crop-512 diffusion train step under env-flag variants.

One process, one TPU init: traces/compiles the same train step once per
mode (the mode env vars are read at trace time), then times N donated
steps back-to-back with a final device->host fetch. Reports ms/step and
steps/s per mode.

Usage:
    python scripts/bench_train_ab.py --modes NOISEDIFF_GN_STATS=reduce,NOISEDIFF_GN_STATS=mxu \
        [--steps 20] [--crop 512] [--batch 4]

The pseudo-var EMA=fused|host switches the EMA execution mode instead of an
env flag: fused = in-jit branch-free lerp every step; host = ema_in_step=
False + ema.HostEma (the production trainer path). With --steps 20 every
timed window contains exactly ONE host apply, so host-mode ms/step is the
honestly amortised production rate.
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
    ap.add_argument("--modes", default="NOISEDIFF_GN_STATS=reduce,NOISEDIFF_GN_STATS=mxu")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
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
    # the step donates its state (crop-512 no-remat only fits donated), so
    # each mode must rebuild params from a host copy — mode 1's donation
    # invalidates the device buffers
    host_params = jax.device_get(params)

    def apply_fn(p, xx, tt, c):
        return model.apply({"params": p}, xx, tt, c)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
        image_size=s, objective="pred_v",
    )
    opt = make_optimizer()
    batch = {
        "noise": jax.random.normal(rng, (b, s, s, 4)) * 0.1,
        "clean_img": cond["clean_img"],
        "coord": cond["position"],
        "iso_ratio_idx": cond["iso_ratio_idx"],
    }

    from noisediff_tpu.train.ema import HostEma

    for mode in args.modes.split(","):
        ema_in_step = True
        for kv in mode.split(";"):
            if not kv:
                continue
            k, _, v = kv.partition("=")
            if k == "EMA":
                ema_in_step = v != "host"
            elif v:
                os.environ[k] = v
            else:
                os.environ.pop(k, None)
        state = create_train_state(jax.device_put(host_params), opt,
                                   with_ema=True)
        step = jax.jit(
            make_diffusion_train_step(gd, opt, ema_in_step=ema_in_step),
            donate_argnums=0,
        )
        ema_host = None if ema_in_step else HostEma()

        def one(state):
            state, m = step(state, batch, rng)
            if ema_host is not None:
                state = ema_host.maybe_apply(state)
            return state, m

        state, m = one(state)  # compile (call 0 also compiles the apply jit)
        key = "diffusion_loss" if "diffusion_loss" in m else "loss_sum"
        float(m[key])
        state, m = one(state)
        float(m[key])
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = one(state)
            float(m[key])
            dt = (time.perf_counter() - t0) / args.steps
            best = dt if best is None else min(best, dt)
        print(f"{mode:45s} {best*1e3:8.1f} ms/step  {1.0/best:6.3f} steps/s",
              flush=True)


if __name__ == "__main__":
    main()
