"""Benchmark: bulk synthetic-noise generation throughput on one TPU chip.

Headline metric (BASELINE.json): DDIM noise patches/sec/chip, 256x256x4
patches from the flagship NoiseDiffNet (dim=48), ISO/coord-conditioned —
the throughput-critical path of the reference (SURVEY.md §3.2: 1000
sequential UNet evals per batch under a Python loop).

vs_baseline methodology (no torch-on-TPU reference exists, BASELINE.md):
the baseline is THIS framework run in reference-faithful mode — fp32,
ancestral DDPM with the shipped T=1000 schedule, batch 4 (script.sh:10) —
measured on the same chip. The headline is the TPU-native configuration:
bf16 UNet compute (fp32 schedule math), DDIM-100, batch sized for the chip.
Baseline cost is measured per UNet evaluation (steps are homogeneous) and
scaled to the shipped 1000-step chain. See BENCH_NOTES.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/noisediff_jax_cache_tpu")

import jax
import jax.numpy as jnp

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule

PATCH = int(os.environ.get("BENCH_PATCH", 256))
BATCH = int(os.environ.get("BENCH_BATCH", 8))
DDIM_STEPS = int(os.environ.get("BENCH_DDIM_STEPS", 100))
BASELINE_PROBE_STEPS = int(os.environ.get("BENCH_BASELINE_STEPS", 20))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def build(dim, s, dtype):
    model = NoiseDiffNet(dim=dim, dtype=dtype)
    b = 1
    x = jnp.zeros((b, s, s, 4), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    cond = {
        "clean_img": jnp.zeros((b, s, s, 4), jnp.float32),
        "position": jnp.zeros((b, s, s, 2), jnp.float32),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    # jit the init: op-by-op dispatch of hundreds of param initialisers is
    # minutes of round-trips on a tunneled TPU
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, condition):
        return model.apply({"params": p}, xx, tt, condition)

    return apply_fn, params


def make_cond(b, s, rng):
    return {
        "clean_img": jax.random.uniform(rng, (b, s, s, 4)),
        "position": jax.random.uniform(rng, (b, s, s, 2)),
        "iso_ratio_idx": jnp.full((b,), 24, jnp.int32),
    }


def timed(fn, *args, repeats=REPEATS):
    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)

    # --- headline: bf16 DDIM-100, batch sized for the chip -----------------
    apply_fn, params = build(48, PATCH, jnp.bfloat16)
    gd = GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", 1000),
        image_size=PATCH,
        objective="pred_v",
    )
    cond = make_cond(BATCH, PATCH, rng)
    shape = (BATCH, PATCH, PATCH, 4)

    sample = jax.jit(
        lambda p, r, c: gd.ddim_sample(p, r, shape, c, sampling_timesteps=DDIM_STEPS)
    )
    t_opt = timed(sample, params, rng, cond)
    patches_per_sec = BATCH / t_opt

    # framework extension: DPM-Solver++(2M) at 25 steps (quality-comparable
    # to DDIM-100 in the diffusion literature; see diffusion/gaussian.py)
    dpm_steps = int(os.environ.get("BENCH_DPM_STEPS", 25))
    sample_dpm = jax.jit(
        lambda p, r, c: gd.dpm_solver_sample(p, r, shape, c, sampling_timesteps=dpm_steps)
    )
    t_dpm = timed(sample_dpm, params, rng, cond)
    dpm_patches_per_sec = BATCH / t_dpm

    # --- baseline: fp32, reference-shipped config (DDPM T=1000, bs=4) ------
    apply32, params32 = build(48, PATCH, None)
    gd32 = GaussianDiffusion(
        apply_fn=apply32,
        schedule=make_schedule("sigmoid2", 1000),
        image_size=PATCH,
        objective="pred_v",
    )
    cond4 = make_cond(4, PATCH, rng)
    probe = jax.jit(
        lambda p, r, c: gd32.ddim_sample(
            p, r, (4, PATCH, PATCH, 4), c, sampling_timesteps=BASELINE_PROBE_STEPS
        )
    )
    t_probe = timed(probe, params32, rng, cond4, repeats=1)
    per_eval = t_probe / BASELINE_PROBE_STEPS  # one UNet eval per step
    baseline_patches_per_sec = 4.0 / (per_eval * 1000.0)

    print(
        json.dumps(
            {
                "metric": "ddim_noise_patches_per_sec_per_chip",
                "value": round(patches_per_sec, 4),
                "unit": f"{PATCH}x{PATCH}x4 patches/s (DDIM-{DDIM_STEPS}, bf16, bs={BATCH})",
                "vs_baseline": round(patches_per_sec / baseline_patches_per_sec, 2),
                "baseline": round(baseline_patches_per_sec, 4),
                "baseline_unit": "patches/s (fp32 DDPM-1000-equivalent, bs=4, reference-shipped config)",
                "batch_seconds": round(t_opt, 3),
                "dpm_solver_patches_per_sec": round(dpm_patches_per_sec, 4),
                "dpm_solver_steps": dpm_steps,
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
