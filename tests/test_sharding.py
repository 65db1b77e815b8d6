"""Mesh / sharding tests on the 8-virtual-device CPU backend.

Validates the TPU-native replacement for the reference's NCCL DDP
(SURVEY.md §2.7): data-parallel gradient math is identical to single-device,
and the 3-D (data, spatial, model) mesh — batch, image-height, and wide
conv-channel sharding — compiles and executes a full train step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule
from noisediff_tpu.parallel import (
    data_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)
from noisediff_tpu.train.state import (
    create_train_state,
    make_diffusion_train_step,
    make_optimizer,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.axis_names == ("data",)
    assert m.shape["data"] == 8
    m2 = make_mesh({"data": 2, "spatial": 2, "model": -1})
    assert m2.shape == {"data": 2, "spatial": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def _setup(s=16, b=8):
    model = NoiseDiffNet(dim=16)
    cond = {
        "clean_img": jnp.zeros((1, s, s, 4)),
        "position": jnp.zeros((1, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.zeros((1,), jnp.int32), cond
    )

    def apply_fn(params, xx, tt, condition):
        return model.apply({"params": params}, xx, tt, condition)

    gd = GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", 8),
        image_size=s,
        objective="pred_v",
    )
    rng = jax.random.PRNGKey(1)
    batch = {
        "noise": jax.random.normal(rng, (b, s, s, 4)) * 0.1,
        "clean_img": jax.random.uniform(rng, (b, s, s, 4)),
        "coord": jax.random.uniform(rng, (b, s, s, 2)),
        "iso_ratio_idx": jnp.arange(b, dtype=jnp.int32),
    }
    return gd, variables["params"], batch


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    gd, params, batch = _setup()
    opt = make_optimizer()
    step = make_diffusion_train_step(gd, opt, donate=False)
    rng = jax.random.PRNGKey(7)

    # single device
    state = create_train_state(params, opt, with_ema=False)
    _, metrics_single = step(state, batch, rng)

    # 8-way data parallel: shard the batch, replicate params
    mesh = make_mesh()
    sharded_batch = shard_batch(mesh, batch)
    assert sharded_batch["noise"].sharding.spec[0] == "data"
    params_r = jax.device_put(params, replicated(mesh))
    state_r = create_train_state(params_r, opt, with_ema=False)
    _, metrics_dp = step(state_r, sharded_batch, rng)

    np.testing.assert_allclose(
        float(metrics_single["diffusion_loss"]),
        float(metrics_dp["diffusion_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(metrics_single["grad_norm"]), float(metrics_dp["grad_norm"]), rtol=1e-4
    )


def test_param_sharding_rules_tp():
    gd, params, _ = _setup()
    mesh = make_mesh({"data": 2, "spatial": 2, "model": 2})
    rules = param_sharding_rules(mesh, params, min_width=128)
    specs = {s.spec for s in jax.tree.leaves(rules)}
    assert P() in specs  # narrow layers replicated
    # wide layers sharded on the last axis over 'model'
    assert any(s != P() and s[-1] == "model" for s in specs)


@pytest.mark.slow
def test_full_3d_mesh_train_step():
    """dp x sp x tp train step: batch over 'data', H over 'spatial', wide
    kernels over 'model'."""
    gd, params, batch = _setup(s=16, b=4)
    opt = make_optimizer()
    mesh = make_mesh({"data": 2, "spatial": 2, "model": 2})

    params_s = jax.tree.map(
        lambda x, sh: jax.device_put(x, sh), params, param_sharding_rules(mesh, params)
    )
    state = create_train_state(params_s, opt, with_ema=False)
    batch_s = shard_batch(mesh, batch, spatial=True)
    assert batch_s["noise"].sharding.spec[:2] == ("data", "spatial")

    step = make_diffusion_train_step(gd, opt, donate=False)
    state2, metrics = step(state, batch_s, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["diffusion_loss"]))
    assert int(state2.step) == 1


def test_sampler_sharded_over_data_axis():
    """Bulk generation (the throughput path): DDIM scan with the batch dim
    sharded across the mesh."""
    gd, params, batch = _setup(s=16, b=8)
    mesh = make_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    cond = shard_batch(
        mesh,
        {
            "clean_img": batch["clean_img"],
            "position": batch["coord"],
            "iso_ratio_idx": batch["iso_ratio_idx"],
        },
    )

    out = jax.jit(
        lambda p, r, c: gd.ddim_sample(p, r, (8, 16, 16, 4), c, sampling_timesteps=2)
    )(params_r, jax.random.PRNGKey(3), cond)
    out.block_until_ready()
    assert out.shape == (8, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
