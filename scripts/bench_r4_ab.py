"""Round-4 combined A/B on the real chip, one process (compiles are the
scarce resource on this tunnel — ~2 min each today):

1. eval ms/eval at the headline shape, default env  (GN kernels now gated
   to train traces -> expect the pre-round-3 ~19-20.6 ms)
2. eval ms/eval with NOISEDIFF_GN_STATS=pallas      (the round-3 regression)
3. train ms/step crop 512 bs 4, EMA fused in-step   (round-3 production)
4. train ms/step crop 512 bs 4, EMA host-scheduled  (round-4 production)

Usage: python scripts/bench_r4_ab.py [--skip eval|train]
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
    ap.add_argument("--skip", default="")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from noisediff_tpu.diffusion import GaussianDiffusion
    from noisediff_tpu.ops.schedules import make_schedule

    out = {}

    if "eval" not in args.skip:
        _, apply_fn, params = bench.build(48, 256, jnp.bfloat16, batch=8)
        for env in ("", "pallas"):
            if env:
                os.environ["NOISEDIFF_GN_STATS"] = env
            else:
                os.environ.pop("NOISEDIFF_GN_STATS", None)
            t0 = time.time()
            ms = bench.unet_eval_ms(apply_fn, params, 8, 256, "bf16")
            key = f"eval_ms[{env or 'default'}]"
            out[key] = round(ms, 3)
            print(json.dumps({key: out[key], "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
        os.environ.pop("NOISEDIFF_GN_STATS", None)

    if "train" not in args.skip:
        os.environ["NOISEDIFF_PACKED_HEADS"] = "0"
        from noisediff_tpu.models import NoiseDiffNet
        from noisediff_tpu.train.ema import HostEma
        from noisediff_tpu.train.state import (
            create_train_state,
            make_diffusion_train_step,
            make_optimizer,
        )

        s, b = 512, 4
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
        for mode in ("fused", "host"):
            state = create_train_state(
                jax.device_put(host_params), opt, with_ema=True
            )
            step = jax.jit(
                make_diffusion_train_step(gd, opt, ema_in_step=mode == "fused"),
                donate_argnums=0,
            )
            ema_host = None if mode == "fused" else HostEma()

            def one(state):
                state, m = step(state, batch, rng)
                if ema_host is not None:
                    state = ema_host.maybe_apply(state)
                return state, m

            t0 = time.time()
            state, m = one(state)
            float(m["diffusion_loss"])
            compile_s = time.time() - t0
            state, m = one(state)
            float(m["diffusion_loss"])
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    state, m = one(state)
                float(m["diffusion_loss"])
                dt = (time.perf_counter() - t0) / args.steps
                best = dt if best is None else min(best, dt)
            key = f"train_ms_per_step[ema={mode}]"
            out[key] = round(best * 1e3, 1)
            print(json.dumps({key: out[key],
                              "steps_per_sec": round(1.0 / best, 3),
                              "compile_s": round(compile_s, 1)}), flush=True)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
