"""Separate launch overhead from device compute: time K model evals fused
into ONE executable (lax.scan) vs K separate dispatches, zeros vs random."""
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

B, S, K = 8, 256, 20


def main():
    model = NoiseDiffNet(dim=48, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, S, S, 4))
    t = jnp.zeros((B,), jnp.int32)
    cond = {
        "clean_img": jax.random.uniform(rng, (B, S, S, 4)),
        "position": jax.random.uniform(rng, (B, S, S, 2)),
        "iso_ratio_idx": jnp.zeros((B,), jnp.int32),
    }
    params = jax.jit(model.init)(rng, x, t, cond)["params"]

    def fwd(p, xx):
        return model.apply({"params": p}, xx, t, cond)

    # K evals fused in one executable
    @jax.jit
    def fused(p, xx):
        def body(carry, _):
            out = fwd(p, carry)
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, xx, None, length=K)
        return out

    # value-fetch sync: block_until_ready returns early on the axon runtime
    float(fused(params, x).astype(jnp.float32).mean())
    t0 = time.perf_counter()
    float(fused(params, x).astype(jnp.float32).mean())
    dt_fused = (time.perf_counter() - t0) / K
    print(f"fused {K}-eval scan: {dt_fused*1e3:.2f} ms/eval")

    # K separate dispatches
    jfwd = jax.jit(fwd)
    out = jfwd(params, x)
    float(out.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(K):
        out = jfwd(params, out.astype(x.dtype))  # dependent chain, no overlap tricks
    float(out.astype(jnp.float32).mean())
    dt_sep = (time.perf_counter() - t0) / K
    print(f"separate dispatch chain: {dt_sep*1e3:.2f} ms/eval")


if __name__ == "__main__":
    main()
