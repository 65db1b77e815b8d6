"""Torch-checkpoint import tests.

The key-set fixtures were dumped from the reference torch models
(models/archs/Diffusion_arch.py NoiseDiffNet dim=48; SID_arch.py LSID):
416 and 42 keys with shapes. The mapper must produce exactly those keys and
matching (transposed) shapes. Numeric equivalence of the layout transforms
is checked against live torch modules (torch-cpu is available).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models import LSID, NoiseDiffNet
from noisediff_tpu.train import torch_import

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _flax_params(model, *args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return shapes["params"]


def _cond(b=1, s=16):
    return {
        "clean_img": jnp.zeros((b, s, s, 4)),
        "position": jnp.zeros((b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }


def _torch_shape_of(flax_shape, transform):
    if transform == "conv_or_linear":
        if len(flax_shape) == 4:
            kh, kw, i, o = flax_shape
            return [o, i, kh, kw]
        if len(flax_shape) == 2:
            i, o = flax_shape
            return [o, i]
    if transform == "conv_transpose":
        kh, kw, i, o = flax_shape
        return [i, o, kh, kw]
    return list(flax_shape)


@pytest.mark.parametrize(
    "fixture,make",
    [
        (
            "noisediffnet_torch_keys.json",
            lambda: _flax_params(
                NoiseDiffNet(dim=48),
                jnp.zeros((1, 16, 16, 4)),
                jnp.zeros((1,), jnp.int32),
                _cond(),
            ),
        ),
        (
            "lsid_torch_keys.json",
            lambda: _flax_params(LSID(), jnp.zeros((1, 32, 32, 4))),
        ),
    ],
)
def test_keymap_matches_reference_state_dict(fixture, make):
    with open(os.path.join(FIXTURES, fixture)) as f:
        ref = json.load(f)
    params = make()
    keymap = torch_import.flax_to_torch_keymap(params)

    assert set(keymap) == set(ref), (
        f"missing={sorted(set(ref) - set(keymap))[:6]} "
        f"extra={sorted(set(keymap) - set(ref))[:6]}"
    )
    # shapes must agree modulo the layout transform
    flat = {
        tuple(k.key for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    for tkey, (fpath, transform) in keymap.items():
        tshape = _torch_shape_of(flat[fpath].shape, transform)
        assert tshape == ref[tkey], f"{tkey}: {tshape} vs {ref[tkey]}"


def test_conv_transform_numeric():
    """A flax Conv with an imported torch Conv2d weight computes the same map."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)

    with torch.no_grad():
        tout = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fconv = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)])
    variables = fconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": tconv.bias.detach().numpy(),
    }
    fout = np.asarray(fconv.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(fout.transpose(0, 3, 1, 2), tout, rtol=1e-4, atol=1e-5)


def test_conv_transpose_transform_numeric():
    """flax ConvTranspose(k=2, s=2) with transposed torch weights matches
    torch ConvTranspose2d — validates the LSID up6..up9 import rule."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    tup = torch.nn.ConvTranspose2d(4, 6, 2, stride=2, bias=False)
    x = np.random.default_rng(1).normal(size=(1, 5, 7, 4)).astype(np.float32)
    with torch.no_grad():
        tout = tup(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fup = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID", use_bias=False)
    _ = fup.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "kernel": torch_import._apply_transform(
            tup.weight.detach().numpy(), "conv_transpose", (2, 2, 4, 6)
        )
    }
    fout = np.asarray(fup.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(fout.transpose(0, 3, 1, 2), tout, rtol=1e-4, atol=1e-5)


def test_linear_transform_numeric():
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    tlin = torch.nn.Linear(7, 3)
    x = np.random.default_rng(2).normal(size=(4, 7)).astype(np.float32)
    with torch.no_grad():
        tout = tlin(torch.from_numpy(x)).numpy()
    flin = nn.Dense(3)
    _ = flin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"kernel": tlin.weight.detach().numpy().T, "bias": tlin.bias.detach().numpy()}
    fout = np.asarray(flin.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(fout, tout, rtol=1e-4, atol=1e-5)


def test_import_roundtrip_small():
    """Fabricate a torch-keyed state_dict from the mapper itself, import it,
    and verify values landed (transposed) in the right leaves."""
    params = _flax_params(LSID(), jnp.zeros((1, 32, 32, 4)))
    keymap = torch_import.flax_to_torch_keymap(params)
    rng = np.random.default_rng(3)
    sd = {}
    for tkey, (fpath, transform) in keymap.items():
        flat = {
            tuple(k.key for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        sd[tkey] = rng.normal(size=_torch_shape_of(flat[fpath].shape, transform)).astype(
            np.float32
        )
    # concretise the tree (eval_shape gives ShapeDtypeStructs)
    concrete = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    loaded = torch_import.import_torch_params(concrete, sd, strict=True)
    # check one conv and one conv-transpose leaf numerically
    got = loaded["conv1_1"]["conv"]["kernel"]
    np.testing.assert_allclose(got, sd["conv1_1.weight"].transpose(2, 3, 1, 0))
    got_up = loaded["up6"]["kernel"]
    np.testing.assert_allclose(
        got_up, sd["up6.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
    )


def test_strip_module_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = torch_import.strip_module_prefix(sd)
    assert out == {"a.weight": 1, "b.bias": 2}


def test_strict_mismatch_raises():
    params = _flax_params(LSID(), jnp.zeros((1, 32, 32, 4)))
    concrete = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    with pytest.raises(KeyError):
        torch_import.import_torch_params(concrete, {"bogus.weight": np.zeros(3)}, strict=True)
