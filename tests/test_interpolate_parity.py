"""GaussianDiffusion.interpolate cross-check vs the live torch reference
(denoising_diffusion_pytorch.py:454-471).

Stochastic parity across RNGs is impossible in general, so the torch side is
fed the exact noise sequence the jax side draws (monkeypatched
torch.randn_like): q_sample(x1) noise, q_sample(x2) noise, then one p_sample
noise per step t-1..1. This pins the deterministic math — q_sample mixing,
the lam blend, per-step posterior mean/log-variance, x_start clipping, and
the step ordering — against the reference implementation.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def test_interpolate_matches_torch_reference(monkeypatch):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # torchvision isn't installed in this image; the reference module only
    # imports it at top level (transforms/utils are unused on this path)
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.utils = types.ModuleType("torchvision.utils")
        monkeypatch.setitem(sys.modules, "torchvision", tv)
    if "ema_pytorch" not in sys.modules:
        ep = types.ModuleType("ema_pytorch")
        ep.EMA = object  # only referenced by the Trainer class, unused here
        monkeypatch.setitem(sys.modules, "ema_pytorch", ep)
    from models.denoising_diffusion_pytorch import (
        GaussianDiffusion as TorchGD,
    )

    import jax
    import jax.numpy as jnp

    from noisediff_tpu.diffusion import GaussianDiffusion
    from noisediff_tpu.ops.schedules import make_schedule

    T, B, S, C, t_interp, lam = 16, 2, 8, 4, 12, 0.3

    class Dummy(torch.nn.Module):
        channels = C
        out_dim = C
        self_condition = False
        random_or_learned_sinusoidal_cond = False

        def forward(self, x, t, condition=None):
            return 0.1 * x

    dummy = Dummy()
    dummy.module = dummy  # the reference ctor probes .module unconditionally
    tgd = TorchGD(
        dummy, image_size=S, timesteps=T, objective="pred_v",
        beta_schedule="sigmoid2",
    )

    def apply_fn(params, x, t, condition):
        return 0.1 * x

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", T),
        image_size=S, channels=C, objective="pred_v",
    )

    rng = jax.random.PRNGKey(3)
    x1 = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (B, S, S, C),
                                       minval=-1, maxval=1))
    x2 = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (B, S, S, C),
                                       minval=-1, maxval=1))

    # replicate the exact draw sequence interpolate makes (gaussian.py)
    k1, k2, rng_steps = jax.random.split(rng, 3)
    shape = (B, S, S, C)
    seq = [
        np.asarray(jax.random.normal(k1, shape, jnp.float32)),
        np.asarray(jax.random.normal(k2, shape, jnp.float32)),
    ] + [
        np.asarray(jax.random.normal(jax.random.fold_in(rng_steps, i), shape))
        for i in range(t_interp - 1, 0, -1)
    ]
    it = iter(seq)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x: torch.from_numpy(np.transpose(next(it), (0, 3, 1, 2)).copy()),
    )

    tx1 = torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)).copy())
    tx2 = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)).copy())
    want = tgd.interpolate(tx1, tx2, t=t_interp, lam=lam).numpy()

    got = np.asarray(
        gd.interpolate(None, rng, jnp.asarray(x1), jnp.asarray(x2),
                       t=t_interp, lam=lam)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, rtol=2e-4, atol=2e-4
    )
