"""Shape / parameter-count parity tests for the model library.

Param-count goldens were measured by instantiating the reference torch
networks (models/archs/*.py) at dim=48, inp_dim=cond_dim=4:
  NoiseDiffNet              21,268,088
  UNet_PosEmbV2             19,702,596
  UNet_PosEmbV2_NoPosition  19,700,308
  UNet_PosEmbV2_CameraCond  21,262,164
  LSID                       7,760,004

Full-size param counts use jax.eval_shape (trace-only — the CI box has one
CPU core); real forward passes run at dim=16 / small spatial sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models import (
    LSID,
    NoiseDiffNet,
    UNet_PosEmbV2,
    UNet_PosEmbV2_CameraCond,
    UNet_PosEmbV2_NoPosition,
    define_network,
)


def _param_count_abstract(model, *args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))


def _cond(b=1, s=16):
    rng = jax.random.PRNGKey(0)
    return {
        "clean_img": jax.random.uniform(rng, (b, s, s, 4)),
        "position": jax.random.uniform(rng, (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([3] * b, jnp.int32),
    }


def _abstract_inputs(b=1, s=16):
    x = jnp.zeros((b, s, s, 4))
    t = jnp.zeros((b,), jnp.int32)
    return x, t


@pytest.mark.parametrize(
    "ctor,count",
    [
        (NoiseDiffNet, 21_268_088),
        (UNet_PosEmbV2, 19_702_596),
        (UNet_PosEmbV2_NoPosition, 19_700_308),
        (UNet_PosEmbV2_CameraCond, 21_262_164),
    ],
)
def test_param_counts_match_reference(ctor, count):
    model = ctor(dim=48)
    x, t = _abstract_inputs()
    cond = _cond()
    if ctor is UNet_PosEmbV2_NoPosition:
        cond = cond["clean_img"]  # bare-tensor condition (others_arch.py:661)
    assert _param_count_abstract(model, x, t, cond) == count


def test_lsid_param_count():
    assert _param_count_abstract(LSID(), jnp.zeros((1, 32, 32, 4))) == 7_760_004


def test_noisediffnet_forward_small():
    model = NoiseDiffNet(dim=16)
    b, s = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 4))
    t = jnp.array([0, 7], jnp.int32)
    cond = _cond(b, s)
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (b, s, s, 4)
    assert jnp.isfinite(out).all()
    # conditioning must matter: different ISO index -> different output
    cond2 = dict(cond, iso_ratio_idx=jnp.array([60] * b, jnp.int32))
    out2 = model.apply(variables, x, t, cond2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("ctor", [UNet_PosEmbV2, UNet_PosEmbV2_CameraCond])
def test_posemb_variants_forward_small(ctor):
    model = ctor(dim=16)
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 4))
    t = jnp.zeros((b,), jnp.int32)
    cond = _cond(b, s)
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (b, s, s, 4)


def test_noposition_forward_small():
    model = UNet_PosEmbV2_NoPosition(dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond = jnp.zeros((1, 16, 16, 4))
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    assert model.apply(variables, x, t, cond).shape == (1, 16, 16, 4)


def test_lsid_forward_and_odd_input():
    model = LSID()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 4)))
    assert out.shape == (2, 32, 32, 4)
    # ceil-mode pooling + decoder cropping must survive non-power-of-two dims
    out = model.apply(variables, jnp.zeros((1, 48, 80, 4)))
    assert out.shape == (1, 48, 80, 4)


def test_registry():
    import types

    cfg = types.SimpleNamespace(dim=48, inp_dim=4, cond_dim=4)
    net = define_network("NoiseDiffNet", cfg)
    assert isinstance(net, NoiseDiffNet)
    with pytest.raises(ValueError):
        define_network("NopeNet", cfg)


@pytest.mark.slow
def test_noisediffnet_remat_equivalent():
    """remat=True must not change params or outputs — only the backward's
    memory/FLOP trade."""
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 4))
    t = jnp.zeros((b,), jnp.int32)
    cond = _cond(b, s)
    m0 = NoiseDiffNet(dim=16, remat=False)
    m1 = NoiseDiffNet(dim=16, remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), x, t, cond)
    out0 = m0.apply(v0, x, t, cond)
    out1 = m1.apply(v0, x, t, cond)  # same params tree
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-5, atol=1e-6)
    # gradients flow through the remat wrapper
    g = jax.grad(lambda p: (m1.apply({"params": p}, x, t, cond) ** 2).sum())(
        v0["params"]
    )
    assert np.isfinite(max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)))


@pytest.mark.slow
def test_noisediffnet_bf16_forward():
    model = NoiseDiffNet(dim=16, dtype=jnp.bfloat16)
    b, s = 1, 16
    x = jnp.zeros((b, s, s, 4), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, _cond(b, s))
    out = model.apply(variables, x, t, _cond(b, s))
    assert out.dtype == jnp.bfloat16
    assert jnp.isfinite(out.astype(jnp.float32)).all()
