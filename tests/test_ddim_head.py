"""Parity tests for the fused heads+DDIM-update sampler kernel.

The fused path (NoiseDiffNet(trunk_only=True) + ops/pallas/ddim_head) must
produce the SAME samples as the regular ddim_sample scan — same model
params, same rng — in interpret mode on CPU, both unfolded and
width-folded. This certifies the whole surgery: trunk hook, head-param
banks, scalar packing, and the in-kernel clip/rederive/update math
(reference ddp.py:331-354, :404-444)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule

# every test here inits a whole (dim=16) NoiseDiffNet — slow tier
pytestmark = pytest.mark.slow


def _setup(lane_fold, size=32, batch=2, dim=16):
    rng = jax.random.PRNGKey(0)
    kw = dict(dim=dim, lane_fold=lane_fold)
    model = NoiseDiffNet(**kw)
    trunk = NoiseDiffNet(**kw, trunk_only=True)
    cond = {
        "clean_img": jax.random.uniform(rng, (batch, size, size, 4)),
        "position": jax.random.uniform(rng, (batch, size, size, 2)),
        "iso_ratio_idx": jnp.full((batch,), 24, jnp.int32),
    }
    x = jnp.zeros((batch, size, size, 4))
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, cond)["params"]
    gd = GaussianDiffusion(
        apply_fn=lambda p, xx, tt, c: model.apply({"params": p}, xx, tt, c),
        schedule=make_schedule("sigmoid2", 64),
        image_size=size,
        objective="pred_v",
    )
    trunk_fn = lambda p, xx, tt, c: trunk.apply({"params": p}, xx, tt, c)
    return gd, params, cond, trunk_fn, model


@pytest.mark.parametrize("mode", ["pallas", "xla"])
@pytest.mark.parametrize("lane_fold", [False, True])
def test_fused_ddim_matches_regular(lane_fold, mode):
    gd, params, cond, trunk_fn, model = _setup(lane_fold)
    shape = (2, 32, 32, 4)
    fold = model.effective_fold(32)
    assert fold == (2 if lane_fold else 1)
    rng = jax.random.PRNGKey(7)
    ref = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                         fold_io=fold)
    got = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                         fold_io=fold, trunk_apply_fn=trunk_fn,
                         fused_interpret=True, fused_mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_trunk_only_param_tree_identical():
    """trunk_only must not change the param structure (checkpoint compat)."""
    _, params, cond, trunk_fn, model = _setup(False)
    trunk = NoiseDiffNet(dim=16, lane_fold=False, trunk_only=True)
    x = jnp.zeros((2, 32, 32, 4))
    t = jnp.zeros((2,), jnp.int32)
    p2 = trunk.init(jax.random.PRNGKey(1), x, t, cond)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)


def test_fused_tail_rejects_non_pred_v():
    gd, params, cond, trunk_fn, model = _setup(False)
    gd2 = GaussianDiffusion(
        apply_fn=gd.apply_fn, schedule=gd.schedule, image_size=32,
        objective="pred_noise",
    )
    with pytest.raises(ValueError, match="pred_v"):
        gd2.ddim_sample(params, jax.random.PRNGKey(0), (2, 32, 32, 4), cond,
                        sampling_timesteps=2, trunk_apply_fn=trunk_fn,
                        fused_interpret=True)
