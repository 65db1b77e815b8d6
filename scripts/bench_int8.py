"""Feasibility microbench: int8 MXU conv/matmul vs bf16 on this runtime.

TPU v5e's MXU runs int8 at ~2x the bf16 rate (394 TOPS vs 197 TFLOP/s).
The 19.4 ms UNet eval is matmul/conv-bound (~5.5 ms conv fusions at
107-117 TF/s raw, ~1.9 ms attention matmuls — BENCH_NOTES), so a
quantized w8a8 inference path could buy a step change IF XLA on this
axon-tunneled runtime actually lowers int8 convolutions/dots to the MXU
int8 path. This script answers only that question, with the scan-delta
timing methodology from bench.py (the runtime's block_until_ready
returns early; scalar fetch + scan-length deltas cancel dispatch).

Shapes probed: the model's hot folded conv (B,256,128,96)x3x3x96->96,
a deeper stage, and a plain attention-sized matmul.
"""
import functools
import time

import jax
import jax.numpy as jnp


def timed_fetch(fn, repeats=3):
    float(fn())
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def scan_delta_ms(make_body, x0, n1=2, n2=12):
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(c, _):
            return make_body(c), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out.astype(jnp.float32).mean()

    t1 = timed_fetch(lambda: run(x0, n1))
    t2 = timed_fetch(lambda: run(x0, n2))
    return (t2 - t1) / (n2 - n1) * 1e3


def conv_case(name, b, h, w, cin, cout, kh, kw):
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (b, h, w, cin), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, cin, cout), jnp.float32)

    # bf16 reference
    xb = xf.astype(jnp.bfloat16)
    kb = kf.astype(jnp.bfloat16)

    def body_bf16(c):
        y = jax.lax.conv_general_dilated(
            c, kb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # keep carry shape: cout may differ -> slice/pad to cin
        return y[..., :cin] if cout >= cin else jnp.pad(y, ((0, 0),) * 3 + ((0, cin - cout),))

    ms_bf16 = scan_delta_ms(body_bf16, xb)

    # int8: quantized weights + activations, int32 accumulation
    xi = jnp.clip(jnp.round(xf * 16.0), -127, 127).astype(jnp.int8)
    ki = jnp.clip(jnp.round(kf * 16.0), -127, 127).astype(jnp.int8)

    def body_i8(c):
        y = jax.lax.conv_general_dilated(
            c, ki, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # requantize back to int8 so the scan carry stays int8 (cheap VPU op)
        y = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return y[..., :cin] if cout >= cin else jnp.pad(y, ((0, 0),) * 3 + ((0, cin - cout),))

    ms_i8 = scan_delta_ms(body_i8, xi)

    # mixed: int8 inputs, bf16 output epilogue (closer to a real w8a8 block)
    def body_i8_bf16out(c):
        y = jax.lax.conv_general_dilated(
            c, ki, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16) * jnp.bfloat16(1 / 256.0)
        y = jnp.clip(jnp.round(y * 16.0), -127, 127).astype(jnp.int8)
        return y[..., :cin] if cout >= cin else jnp.pad(y, ((0, 0),) * 3 + ((0, cin - cout),))

    ms_i8b = scan_delta_ms(body_i8_bf16out, xi)

    flops = 2 * b * h * w * cin * cout * kh * kw
    print(
        f"{name}: bf16 {ms_bf16:.3f} ms ({flops/ms_bf16*1e3/1e12:.1f} TF/s) | "
        f"int8 {ms_i8:.3f} ms ({flops/ms_i8*1e3/1e12:.1f} Tops/s) | "
        f"int8+bf16epi {ms_i8b:.3f} ms | speedup {ms_bf16/ms_i8:.2f}x / {ms_bf16/ms_i8b:.2f}x",
        flush=True,
    )


def matmul_case(name, m, k, n):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    ab, wb = a.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    def body_bf16(c):
        y = c @ wb
        return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))

    ms_bf16 = scan_delta_ms(body_bf16, ab)

    ai = jnp.clip(jnp.round(a * 16), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(w * 16), -127, 127).astype(jnp.int8)

    def body_i8(c):
        y = jax.lax.dot_general(
            c, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))

    ms_i8 = scan_delta_ms(body_i8, ai)
    flops = 2 * m * k * n
    print(
        f"{name}: bf16 {ms_bf16:.3f} ms ({flops/ms_bf16*1e3/1e12:.1f} TF/s) | "
        f"int8 {ms_i8:.3f} ms ({flops/ms_i8*1e3/1e12:.1f} Tops/s) | "
        f"speedup {ms_bf16/ms_i8:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    # big dense matmul first: cleanest probe of the int8 MXU path
    matmul_case("matmul 8192x2048x2048", 8192, 2048, 2048)
    # the model's hot folded full-res conv (256^2 eval, lane_fold=2, bs=8)
    conv_case("conv fullres folded C96", 8, 256, 128, 96, 96, 3, 3)
    # deeper stage (C=192 after one down)
    conv_case("conv mid C192", 8, 128, 64, 192, 192, 3, 3)
    # unfolded narrow conv (the pre-fold pathology, for reference)
    conv_case("conv fullres unfolded C48", 8, 256, 256, 48, 48, 3, 3)
