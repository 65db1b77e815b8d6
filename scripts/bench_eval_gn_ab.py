"""Quick eval-shape A/B of the GN-stats kernel gate (round-4 fix).

Measures per-UNet-eval ms at the headline shape (256^2, bs=8, bf16, packed
heads) for the current environment — run twice with NOISEDIFF_GN_STATS
unset (default: kernels gated to train traces only) and =pallas (forced on)
to reproduce the round-3 regression and confirm the gate removes it.

Usage: python scripts/bench_eval_gn_ab.py [--batch 8] [--patch 256]
"""
import argparse
import json
import os
import sys

os.environ.setdefault("NOISEDIFF_PACKED_HEADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA cache: the env var does not reach jax.config on this
# runtime — utils/compilation_cache.enable() sets it programmatically
from noisediff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402
_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench

    _, apply_fn, params = bench.build(
        48, args.patch, jnp.bfloat16, batch=args.batch
    )
    ms = bench.unet_eval_ms(apply_fn, params, args.batch, args.patch, "bf16")
    print(json.dumps({
        "gn_stats_env": os.environ.get("NOISEDIFF_GN_STATS", "<unset>"),
        "unet_eval_ms_bf16": round(ms, 3),
        "patches_per_sec_ddim100": round(args.batch / (ms / 1e3 * 100), 3),
    }))


if __name__ == "__main__":
    main()
