"""Optional noise-range compression mappings.

Parity target: utils/util.py:84-134 (tempsigmoid / inversesigmoid /
piecewise_mapping / inverse_piecewise_mapping) — the --scale_noise /
--temperature CLI options' math. Unused in the shipped configs but part of
the reference's op surface. Pure jnp, branch-free (jnp.where in place of the
reference's boolean-mask assignment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tempsigmoid(x: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    """sigmoid(x/temp) rescaled to (-1, 1)."""
    return jax.nn.sigmoid(x / temp) * 2.0 - 1.0


def inversesigmoid(y: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    y01 = (y + 1.0) / 2.0
    return (jnp.log(y01) - jnp.log1p(-y01)) * temp


def piecewise_mapping(x: jnp.ndarray, b: float = 0.2, temp: float = 0.1) -> jnp.ndarray:
    """tempsigmoid inside [-b, b], linear continuation outside, continuous at
    the knots and mapping +-1 -> +-1."""
    assert 0.0 < b < 1.0, "b must be in (0, 1)"
    k2 = (float(tempsigmoid(jnp.float32(b), temp)) - 1.0) / (b - 1.0)
    mid = tempsigmoid(x, temp)
    lo = k2 * x + k2 - 1.0
    hi = k2 * x + 1.0 - k2
    return jnp.where(x < -b, lo, jnp.where(x > b, hi, mid))


def inverse_piecewise_mapping(
    y: jnp.ndarray, b: float = 0.2, temp: float = 0.1
) -> jnp.ndarray:
    value_at_b = float(tempsigmoid(jnp.float32(b), temp))
    k2 = (value_at_b - 1.0) / (b - 1.0)
    lo = (y - k2 + 1.0) / k2
    hi = (y + k2 - 1.0) / k2
    # clamp the sigmoid branch's input away from +-1 so the unused lanes of
    # the where don't produce inf/nan
    y_mid = jnp.clip(y, -value_at_b, value_at_b)
    mid = inversesigmoid(y_mid, temp)
    return jnp.where(y < -value_at_b, lo, jnp.where(y > value_at_b, hi, mid))
