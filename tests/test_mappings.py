"""Noise-range compression mapping tests: round trips, continuity, torch parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.ops import mappings as mp


def test_tempsigmoid_inverse_roundtrip():
    x = jnp.linspace(-0.9, 0.9, 21)
    y = mp.tempsigmoid(x, temp=0.5)
    np.testing.assert_allclose(
        np.asarray(mp.inversesigmoid(y, temp=0.5)), np.asarray(x), rtol=1e-4, atol=1e-5
    )


def test_piecewise_roundtrip():
    x = jnp.linspace(-1.0, 1.0, 41)
    y = mp.piecewise_mapping(x, b=0.2, temp=0.1)
    back = mp.inverse_piecewise_mapping(y, b=0.2, temp=0.1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_piecewise_continuity_and_range():
    b, temp = 0.2, 0.1
    eps = 1e-4
    lo = float(mp.piecewise_mapping(jnp.float32(b - eps), b, temp))
    hi = float(mp.piecewise_mapping(jnp.float32(b + eps), b, temp))
    assert abs(lo - hi) < 1e-3  # continuous at the knot
    # +-1 maps to +-1 (the linear pieces are anchored there)
    np.testing.assert_allclose(float(mp.piecewise_mapping(jnp.float32(1.0), b, temp)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(mp.piecewise_mapping(jnp.float32(-1.0), b, temp)), -1.0, atol=1e-6)


def test_parity_with_torch_reference_formulas():
    torch = pytest.importorskip("torch")

    def t_tempsigmoid(x, temp=1.0):
        return torch.sigmoid(x / temp) * 2 - 1

    def t_piecewise(x, b=0.2, temp=0.1):
        k2 = (t_tempsigmoid(torch.tensor(b), temp) - 1) / (b - 1)
        y = torch.zeros_like(x)
        mid = torch.logical_and(x >= -b, x <= b)
        y[mid] = t_tempsigmoid(x[mid], temp)
        y[x < -b] = k2 * x[x < -b] + k2 - 1
        y[x > b] = k2 * x[x > b] + 1 - k2
        return y

    x = np.linspace(-1, 1, 33).astype(np.float32)
    got = np.asarray(mp.piecewise_mapping(jnp.asarray(x)))
    exp = t_piecewise(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)
