"""Quick A/B: fused heads+DDIM-update tail vs regular scan, on-chip.

Per-UNet-eval ms via sampling-step deltas (cancels dispatch+fetch, same
methodology as bench.py). Run on the TPU backend.
"""
import os
import time

# persistent XLA cache: the env var does not reach jax.config on this
# runtime — utils/compilation_cache.enable() sets it programmatically
from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402
_enable_cache()

import jax
import jax.numpy as jnp

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule

PATCH, BATCH = 256, 8
N1, N2 = int(os.environ.get("N1", 20)), int(os.environ.get("N2", 120))


def timed(fn, *args, repeats=3):
    float(fn(*args))
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = jax.random.PRNGKey(0)
    model = NoiseDiffNet(dim=48, dtype=jnp.bfloat16)
    trunk = model.clone(trunk_only=True)
    x = jnp.zeros((1, PATCH, PATCH, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    cond1 = {
        "clean_img": jnp.zeros((1, PATCH, PATCH, 4), jnp.float32),
        "position": jnp.zeros((1, PATCH, PATCH, 2), jnp.float32),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond1)["params"]

    def apply_fn(p, xx, tt, c):
        return model.apply({"params": p}, xx, tt, c)

    def trunk_fn(p, xx, tt, c):
        return trunk.apply({"params": p}, xx, tt, c)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 1000),
        image_size=PATCH, objective="pred_v",
    )
    cond = {
        "clean_img": jax.random.uniform(rng, (BATCH, PATCH, PATCH, 4)),
        "position": jax.random.uniform(rng, (BATCH, PATCH, PATCH, 2)),
        "iso_ratio_idx": jnp.full((BATCH,), 24, jnp.int32),
    }
    shape = (BATCH, PATCH, PATCH, 4)
    fold_io = model.effective_fold(PATCH)
    print(f"backend={jax.default_backend()} fold_io={fold_io}", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def run(p, r, c, n, mode):
        return gd.ddim_sample(
            p, r, shape, c, sampling_timesteps=n, fold_io=fold_io,
            trunk_apply_fn=None if mode == "plain" else trunk_fn,
            fused_mode=mode,
        ).astype(jnp.float32).mean()

    for mode in ("plain", "xla", "pallas"):
        t1 = timed(run, params, rng, cond, N1, mode)
        t2 = timed(run, params, rng, cond, N2, mode)
        ms = (t2 - t1) / (N2 - N1) * 1e3
        print(f"{mode}: per-eval {ms:.2f} ms  "
              f"(t{N1}={t1*1e3:.0f} ms, t{N2}={t2*1e3:.0f} ms)  "
              f"DDIM-100 patches/s ~ {BATCH / (ms * 1e-3 * 100):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
