"""Full-frame spatially-sharded generation test on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.diffusion.fullframe import generate_full_frame
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule
from noisediff_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh


@pytest.mark.slow
def test_generate_full_frame_spatially_sharded():
    model = NoiseDiffNet(dim=16)
    h, w = 32, 48  # miniature packed frame, divisible by the /8 factor
    x = jnp.zeros((1, h, w, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond = {
        "clean_img": jnp.zeros((1, h, w, 4)),
        "position": jnp.zeros((1, h, w, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, condition):
        return model.apply({"params": p}, xx, tt, condition)

    gd = GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", 8),
        image_size=h,
        objective="pred_v",
    )

    mesh = make_mesh({SPATIAL_AXIS: 2}, devices=jax.devices()[:2])
    clean = np.random.default_rng(0).uniform(0, 1, (h, w, 4)).astype(np.float32)
    out = generate_full_frame(
        gd, params, jax.random.PRNGKey(1), clean, iso_ratio_idx=24,
        mesh=mesh, sampler="dpm", sampling_timesteps=3,
    )
    assert out.shape == (h, w, 4)
    assert np.isfinite(out).all()

    # sharded result must match the unsharded single-device run
    mesh1 = make_mesh({SPATIAL_AXIS: 1}, devices=jax.devices()[:1])
    out1 = generate_full_frame(
        gd, params, jax.random.PRNGKey(1), clean, iso_ratio_idx=24,
        mesh=mesh1, sampler="dpm", sampling_timesteps=3,
    )
    np.testing.assert_allclose(out, out1, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fullframe_sharded_with_packed_heads(monkeypatch):
    """cli/test_diffusion sets NOISEDIFF_PACKED_HEADS=1; the spatially
    sharded full-frame path must stay correct with it: the head strides
    over WIDTH while the mesh shards HEIGHT, so GSPMD partitions it
    trivially — this pins that composition (with the lane fold forced on,
    as on TPU)."""
    monkeypatch.setenv("NOISEDIFF_PACKED_HEADS", "1")
    model = NoiseDiffNet(dim=16, lane_fold=True)
    h, w = 32, 48
    x = jnp.zeros((1, h, w, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond = {
        "clean_img": jnp.zeros((1, h, w, 4)),
        "position": jnp.zeros((1, h, w, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, condition):
        return model.apply({"params": p}, xx, tt, condition)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 8),
        image_size=h, objective="pred_v",
    )
    clean = np.random.default_rng(0).uniform(0, 1, (h, w, 4)).astype(np.float32)
    mesh = make_mesh({SPATIAL_AXIS: 2}, devices=jax.devices()[:2])
    out = generate_full_frame(
        gd, params, jax.random.PRNGKey(1), clean, iso_ratio_idx=24,
        mesh=mesh, sampler="dpm", sampling_timesteps=3,
    )
    monkeypatch.delenv("NOISEDIFF_PACKED_HEADS")
    out_ref = generate_full_frame(
        gd, params, jax.random.PRNGKey(1), clean, iso_ratio_idx=24,
        mesh=mesh, sampler="dpm", sampling_timesteps=3,
    )
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_generate_full_frame_real_sid_shape():
    """The REAL packed SID frame shape (1424, 2128) sharded 8-ways over
    'spatial': proves the conv halo exchange at the true aspect ratio and
    per-shard sizes (178 rows/device), not just the 32x48 miniature.
    One DPM-Solver step keeps the CPU run tractable."""
    model = NoiseDiffNet(dim=16)
    h, w = 1424, 2128
    xs = jnp.zeros((1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    cond = {
        "clean_img": xs,
        "position": jnp.zeros((1, 32, 32, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xs, t, cond)["params"]

    def apply_fn(p, xx, tt, condition):
        return model.apply({"params": p}, xx, tt, condition)

    gd = GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", 8),
        image_size=h,
        objective="pred_v",
    )
    mesh = make_mesh({SPATIAL_AXIS: 8}, devices=jax.devices()[:8])
    clean = np.random.default_rng(0).uniform(0, 1, (h, w, 4)).astype(np.float32)
    out = generate_full_frame(
        gd, params, jax.random.PRNGKey(1), clean, iso_ratio_idx=24,
        mesh=mesh, sampler="dpm", sampling_timesteps=1,
    )
    assert out.shape == (h, w, 4)
    assert np.isfinite(out).all()
