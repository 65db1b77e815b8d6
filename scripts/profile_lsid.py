"""Profile the LSID full-frame denoising forward on the TPU.

The production eval path (reference test_denoising.py:318-361 runs one
full-frame LSID forward per image). bench.py reports ~33 frames/s at the
packed SID shape (1, 1424, 2128, 4) bf16; this script decomposes that time:

    python scripts/profile_lsid.py [--trace /tmp/lsid_trace] [--hlo /tmp/lsid_hlo.txt]

then:
    python scripts/xprof_summary.py /tmp/lsid_trace --group
    python scripts/xprof_join_hlo.py /tmp/lsid_trace /tmp/lsid_hlo.txt --evals 10
"""
import argparse
import functools
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

from noisediff_tpu.models import LSID


def fetch(o):
    leaf = jax.tree.leaves(o)[0]
    return float(jnp.asarray(leaf).astype(jnp.float32).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--hlo", default="")
    ap.add_argument("--h", type=int, default=1424)
    ap.add_argument("--w", type=int, default=2128)
    ap.add_argument("--no-fold", action="store_true")
    args = ap.parse_args()

    lsid = LSID(dtype=jnp.bfloat16, lane_fold=False if args.no_fold else None)
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, args.h, args.w, 4))
    params = jax.jit(lsid.init)(jax.random.PRNGKey(10), x)["params"]

    @functools.partial(jax.jit, static_argnums=2)
    def chain(p, x, n):
        def body(c, _):
            return lsid.apply({"params": p}, c).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out.astype(jnp.float32).mean()

    if args.hlo:
        lowered = jax.jit(lambda p, xx: lsid.apply({"params": p}, xx)).lower(params, x)
        with open(args.hlo, "w") as f:
            f.write(lowered.compile().as_text())
        print(f"wrote HLO to {args.hlo}")

    # scan-delta timing (BENCH_NOTES methodology)
    fetch(chain(params, x, 2))
    fetch(chain(params, x, 12))
    t0 = time.perf_counter(); fetch(chain(params, x, 2)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(chain(params, x, 12)); t12 = time.perf_counter() - t0
    ms = (t12 - t2) / 10 * 1e3
    print(f"full-frame LSID forward: {ms:.2f} ms ({1e3/ms:.1f} frames/s)")

    # useful-FLOPs MFU (unfolded lowering so the fold padding isn't counted)
    try:
        lsid_u = LSID(dtype=jnp.bfloat16, lane_fold=False)
        c = jax.jit(lambda p, xx: lsid_u.apply({"params": p}, xx)).lower(params, x).compile()
        fl = c.cost_analysis()["flops"]
        print(f"useful FLOPs/frame: {fl/1e9:.1f} G -> MFU {fl/(ms/1e3)/197e12:.3f}")
    except Exception as e:
        print("cost_analysis failed:", e)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        fetch(chain(params, x, 10))
        jax.profiler.stop_trace()
        print(f"trace in {args.trace} (10 evals in the scan)")


if __name__ == "__main__":
    main()
