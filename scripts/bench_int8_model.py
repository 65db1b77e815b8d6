"""Whole-model int8 measurement: UNet eval ms with NOISEDIFF_INT8=1 vs off,
at the bench configuration (NoiseDiffNet dim=48, 256^2, bs=8, bf16,
lane-fold). Reuses bench.py's build + scan-delta timing."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA cache: the env var does not reach jax.config on this
# runtime — utils/compilation_cache.enable() sets it programmatically
from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402
_enable_cache()

import jax

import bench


def main():
    b, s = bench.BATCH, bench.PATCH
    print("device:", jax.devices()[0].device_kind, flush=True)
    _, apply_fn, params = bench.build(48, s, jax.numpy.bfloat16, batch=b)

    os.environ.pop("NOISEDIFF_INT8", None)
    ms_bf16 = bench.unet_eval_ms(apply_fn, params, b, s, "bf16")
    print(f"bf16 eval: {ms_bf16:.2f} ms", flush=True)

    os.environ["NOISEDIFF_INT8"] = "1"
    ms_int8 = bench.unet_eval_ms(apply_fn, params, b, s, "int8")
    print(f"int8 eval: {ms_int8:.2f} ms  ({ms_bf16 / ms_int8:.3f}x)", flush=True)

    # with the fused attn tail too (the production single-chip setting)
    os.environ["NOISEDIFF_FUSED_ATTN"] = "1"
    ms_int8_fused = bench.unet_eval_ms(apply_fn, params, b, s, "int8+tail")
    print(f"int8+fused-tail eval: {ms_int8_fused:.2f} ms", flush=True)
    os.environ.pop("NOISEDIFF_INT8", None)
    ms_fused = bench.unet_eval_ms(apply_fn, params, b, s, "tail")
    print(f"bf16+fused-tail eval: {ms_fused:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
