"""Numerical forward parity against the live reference torch models.

The strongest parity gate available without pretrained weights: instantiate
the reference networks (torch CPU, random init), import their state_dicts
through train/torch_import, and require the flax forward to reproduce the
torch forward on identical inputs. This validates every block end to end —
GroupNorm eps, exact-GELU, FiLM ordering, attention math, channel orders,
conv-transpose orientation.

Skipped when the reference tree isn't mounted (CI outside the build image).
"""
import os
import sys
from argparse import Namespace

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return torch


def _flax_forward(model, params, x_nhwc, t=None, cond=None):
    import jax.numpy as jnp

    if t is None:
        return np.asarray(model.apply({"params": params}, jnp.asarray(x_nhwc)))
    return np.asarray(
        model.apply({"params": params}, jnp.asarray(x_nhwc), jnp.asarray(t), cond)
    )


def test_lsid_forward_parity(torch_ref):
    torch = torch_ref
    from models.archs.SID_arch import LSID as TorchLSID

    import jax
    import jax.numpy as jnp

    from noisediff_tpu.models import LSID
    from noisediff_tpu.train.torch_import import import_torch_params

    args = Namespace()
    tnet = TorchLSID(args).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    model = LSID()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    params = import_torch_params(jax.tree.map(np.asarray, params), sd, strict=True)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 32, 48, 4)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    f_out = _flax_forward(model, params, x)
    np.testing.assert_allclose(
        f_out.transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-5
    )


def test_noisediffnet_forward_parity(torch_ref):
    torch = torch_ref
    from models.archs.Diffusion_arch import NoiseDiffNet as TorchND

    import jax
    import jax.numpy as jnp

    from noisediff_tpu.models import NoiseDiffNet
    from noisediff_tpu.train.torch_import import import_torch_params

    args = Namespace(
        dim=16, cond_dim=4, inp_dim=4, self_condition=False, normalize_condition=False
    )
    tnet = TorchND(args).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    model = NoiseDiffNet(dim=16)
    b, s = 2, 16
    x = np.random.default_rng(1).normal(0, 0.3, (b, s, s, 4)).astype(np.float32)
    clean = np.random.default_rng(2).uniform(0, 1, (b, s, s, 4)).astype(np.float32)
    coord = np.random.default_rng(3).uniform(0, 1, (b, s, s, 2)).astype(np.float32)
    tvec = np.array([3, 500], np.int64)
    idx = np.array([24, 60], np.int64)

    cond = {
        "clean_img": jnp.asarray(clean),
        "position": jnp.asarray(coord),
        "iso_ratio_idx": jnp.asarray(idx.astype(np.int32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(tvec.astype(np.int32)), cond
    )["params"]
    params = import_torch_params(jax.tree.map(np.asarray, params), sd, strict=True)

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(tvec),
            {
                "clean_img": torch.from_numpy(clean.transpose(0, 3, 1, 2)),
                "position": torch.from_numpy(coord.transpose(0, 3, 1, 2)),
                "iso_ratio_idx": torch.from_numpy(idx),
            },
        ).numpy()

    f_out = _flax_forward(model, params, x, tvec.astype(np.int32), cond)
    np.testing.assert_allclose(
        f_out.transpose(0, 3, 1, 2), t_out, rtol=5e-4, atol=5e-5
    )
