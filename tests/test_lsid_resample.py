"""Parity tests for the LSID TPU-layout reformulations (models/lsid.py):

- _UpPhase: ConvTranspose(k=2, s=2, VALID) as per-phase matmuls + interleave
  (reference SID_arch.py:129-137 uses torch ConvTranspose2d)
- _pool_fold_halving: ceil-mode 2x2 max pool in the width-folded domain
  (reference SID_arch.py uses MaxPool2d(2, 2, ceil_mode=True))
- _packed_head: conv10 as a P-pixel-packed strided conv
- fold-4 level-1/9 lane residency (generalized _fold_conv_kernel)

All are exact reformulations up to float reassociation: the x64 tests pin
bit-level agreement (reassociation vanishes in double), the fp32 tests use
a loose tolerance because LSID has no normalization layers — per-layer
~1e-6 reassociation amplifies geometrically over 18 convs (measured ~1e-2
relative at 512^2 with random He-init weights; trained weights sit far
lower)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from noisediff_tpu.models import LSID
from noisediff_tpu.models.blocks import (
    _fold_conv_kernel,
    fold_width,
    unfold_width,
)
from noisediff_tpu.models.lsid import _UpPhase, _pool_fold_halving


def test_up_phase_matches_conv_transpose():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 10, 8))
    ref = nn.ConvTranspose(
        6, (2, 2), strides=(2, 2), padding="VALID", use_bias=False
    )
    p = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(p, x)
    for fold_out in (1, 2, 4):
        m = _UpPhase(6, fold_out=fold_out)
        y = m.apply({"params": {"kernel": p["params"]["kernel"]}}, x)
        if fold_out > 1:
            y = unfold_width(y, fold_out)
        np.testing.assert_allclose(y, y_ref, atol=2e-6)


def test_up_phase_naive_matches_conv_transpose():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 7, 4))
    ref = nn.ConvTranspose(
        3, (2, 2), strides=(2, 2), padding="VALID", use_bias=False
    )
    p = ref.init(jax.random.PRNGKey(1), x)
    m = _UpPhase(3, naive=True)
    y = m.apply({"params": {"kernel": p["params"]["kernel"]}}, x)
    np.testing.assert_allclose(y, ref.apply(p, x), atol=2e-6)


@pytest.mark.parametrize("fold", [2, 4])
def test_pool_fold_halving(fold):
    # odd H exercises the ceil-mode row; W chosen so every fold divides
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 16, 3))
    want = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
    got = _pool_fold_halving(fold_width(x, fold), fold)
    if fold // 2 > 1:
        got = unfold_width(got, fold // 2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kw,fold", [(3, 4), (1, 4), (7, 4), (3, 8)])
def test_fold_conv_kernel_general(kw, fold):
    # generalized width-fold kernel transform (blocks._fold_selector)
    cin, cout = 5, 7
    k = jax.random.normal(jax.random.PRNGKey(0), (kw, kw, cin, cout))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, cin))
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    kf = _fold_conv_kernel(k, (cin,), fold)
    yf = jax.lax.conv_general_dilated(
        fold_width(x, fold), kf, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(unfold_width(yf, fold), y, atol=1e-4)


def _whole_model_pair(shape, dtype=None):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, dtype or jnp.float32)
    ref = LSID(lane_fold=True, naive_resample=True, dtype=dtype)
    opt = LSID(lane_fold=True, naive_resample=False, dtype=dtype)
    p = jax.jit(ref.init)(jax.random.PRNGKey(1), x)
    p2 = jax.jit(opt.init)(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2))
    )
    return jax.jit(ref.apply)(p, x), jax.jit(opt.apply)(p, x)


@pytest.mark.slow
def test_lsid_resample_parity_small():
    # W%8==0 -> fold-4 levels; packed head OFF at this size
    y_ref, y_opt = _whole_model_pair((2, 24, 32, 4))
    np.testing.assert_allclose(y_opt, y_ref, atol=1e-4)


@pytest.mark.slow
def test_lsid_resample_parity_w8_remainder():
    # W%8==4 keeps fold-2 levels (F1=2 path)
    y_ref, y_opt = _whole_model_pair((1, 24, 36, 4))
    np.testing.assert_allclose(y_opt, y_ref, atol=1e-4)


@pytest.mark.slow
def test_lsid_resample_parity_odd_h():
    y_ref, y_opt = _whole_model_pair((1, 26, 32, 4))
    np.testing.assert_allclose(y_opt, y_ref, atol=1e-4)


_X64_SCRIPT = """
import jax, jax.numpy as jnp
from noisediff_tpu.models import LSID
x = jax.random.uniform(jax.random.PRNGKey(0), (1, 512, 512, 4), jnp.float64)
ref = LSID(lane_fold=True, naive_resample=True, dtype=jnp.float64)
opt = LSID(lane_fold=True, naive_resample=False, dtype=jnp.float64)
p = jax.jit(ref.init)(jax.random.PRNGKey(1), x)
y_ref = jax.jit(ref.apply)(p, x)
y_opt = jax.jit(opt.apply)(p, x)
d = float(jnp.abs(y_opt - y_ref).max())
assert d < 1e-12, d
print("X64_PARITY_OK", d)
"""


@pytest.mark.slow
def test_lsid_resample_parity_packed_head_x64():
    # 512x512 passes the packed-head pixel threshold; x64 removes
    # reassociation noise so agreement is pinned at double rounding.
    # Subprocess: jax_enable_x64 can't be flipped in an initialized process.
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", _X64_SCRIPT],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "X64_PARITY_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
