"""Parity of the reformulated Upsample / Downsample against the naive
(materialise-then-conv) reference formulations, sharing the same parameters.

Upsample's phase decomposition pre-combines kernel taps (fp reassociation),
so tolerance is small-but-nonzero; Downsample's strided kernel is a pure
reindexing and must match exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models.blocks import Downsample, Upsample, fold_width, unfold_width


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("fold_out", [1, 2])
@pytest.mark.parametrize("cin,cout,h,w", [(12, 8, 6, 10), (8, 12, 4, 8)])
def test_upsample_phase_parity(fold_out, cin, cout, h, w):
    x = _rand(0, (2, h, w, cin))
    fast = Upsample(cout, fold_out=fold_out)
    naive = Upsample(cout, fold_out=fold_out, naive=True)
    params = naive.init(jax.random.PRNGKey(1), x)["params"]
    y_naive = naive.apply({"params": params}, x)
    y_fast = fast.apply({"params": params}, x)
    assert y_fast.shape == y_naive.shape
    np.testing.assert_allclose(y_fast, y_naive, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "fold_in,fold_out", [(1, 1), (2, 1), (2, 2)]
)
def test_downsample_strided_parity(fold_in, fold_out):
    cin, cout, h, w = 12, 16, 8, 12
    x = _rand(2, (2, h, w, cin))
    xin = fold_width(x, fold_in) if fold_in > 1 else x
    fast = Downsample(cout, fold_in=fold_in, fold_out=fold_out)
    naive = Downsample(cout, fold_in=fold_in, fold_out=fold_out, naive=True)
    params = naive.init(jax.random.PRNGKey(3), xin)["params"]
    y_naive = naive.apply({"params": params}, xin)
    y_fast = fast.apply({"params": params}, xin)
    assert y_fast.shape == y_naive.shape
    np.testing.assert_allclose(y_fast, y_naive, rtol=1e-6, atol=1e-6)


def test_upsample_folded_equals_unfolded():
    """fold_out=2 output is exactly the width-fold of the fold_out=1 output."""
    cin, cout = 8, 6
    x = _rand(4, (1, 4, 6, cin))
    m1 = Upsample(cout, fold_out=1)
    m2 = Upsample(cout, fold_out=2)
    params = m1.init(jax.random.PRNGKey(5), x)["params"]
    y1 = m1.apply({"params": params}, x)
    y2 = m2.apply({"params": params}, x)
    np.testing.assert_allclose(fold_width(y1, 2), y2, rtol=2e-5, atol=2e-5)


def test_downsample_grad_flows():
    """The strided path must be differentiable (used in training)."""
    cin, cout = 8, 6
    x = _rand(6, (1, 8, 8, cin))
    xf = fold_width(x, 2)
    m = Downsample(cout, fold_in=2, fold_out=2)
    params = m.init(jax.random.PRNGKey(7), xf)["params"]

    def loss(p, x):
        return (m.apply({"params": p}, x) ** 2).sum()

    g = jax.grad(loss)(params, xf)
    assert all(np.isfinite(v).all() for v in jax.tree.leaves(g))
