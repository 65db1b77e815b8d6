"""fold_io sampler parity: keeping the scan carry width-folded must produce
the identical result for deterministic samplers when the initial noise is
pinned (DDIM eta=0 has zero per-step noise coefficient, so only x_T matters).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule


def _setup(s=16, b=1):
    model = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    x = jnp.zeros((b, s, s, 4), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, c):
        return model.apply({"params": p}, xx, tt, c)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 8),
        image_size=s, objective="pred_v",
    )
    return gd, params, cond, (b, s, s, 4)


@pytest.mark.slow
def test_ddim_fold_io_parity():
    gd, params, cond, shape = _setup()
    rng = jax.random.PRNGKey(3)
    x_t = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    y1 = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                        init_noise=x_t)
    y2 = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                        init_noise=x_t, fold_io=2)
    assert y2.shape == shape
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_model_predictions_io_fold_parity():
    """slow: two whole-model compiles (folded + unfolded model_predictions)
    — ~2x the next-slowest fast-tier test under load (round-4 verdict), and
    the shapes are already minimal (16^2, dim=8), so it re-tiers rather
    than shrinks."""
    from noisediff_tpu.models.blocks import fold_width, unfold_width

    gd, params, cond, shape = _setup()
    x = jax.random.normal(jax.random.PRNGKey(5), shape, jnp.float32)
    t = jnp.full((shape[0],), 3, jnp.int32)
    n1, s1 = gd.model_predictions(params, x, t, cond, clip_x_start=True,
                                  rederive_pred_noise=True)
    n2, s2 = gd.model_predictions(params, fold_width(x, 2), t, cond,
                                  clip_x_start=True, rederive_pred_noise=True,
                                  io_fold=2)
    np.testing.assert_allclose(n1, unfold_width(n2, 2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s1, unfold_width(s2, 2), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dpm_fold_io_runs():
    """slow: the whole-model DPM scan compile measures 84 s on a quiet
    1-core box (round-5 re-tier; 2x the next-slowest fast test). Fast-tier
    fold_io coverage stays via test_fold_io_plumbing_stub_model; DPM fold
    parity lives in test_dpm_fold_io_parity (slow)."""
    gd, params, cond, shape = _setup()
    rng = jax.random.PRNGKey(6)
    y = gd.dpm_solver_sample(params, rng, shape, cond, sampling_timesteps=4,
                             fold_io=2)
    assert y.shape == shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_p_sample_loop_fold_io_runs():
    """slow: whichever whole-model fold_io test runs first in a process
    pays the ~80-100 s UNet+sampler compile on the 1-core box (round-5
    measurement: re-tiering one just moved the bill to this one). All
    whole-model fold_io tests are slow-tier; the fast tier keeps fold_io
    PLUMBING coverage via test_fold_io_plumbing_stub_model below."""
    gd, params, cond, shape = _setup()
    rng = jax.random.PRNGKey(7)
    x_t = jax.random.normal(jax.random.PRNGKey(8), shape, jnp.float32)
    y = gd.p_sample_loop(params, rng, shape, cond, init_noise=x_t, fold_io=2)
    assert y.shape == shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_dpm_fold_io_parity():
    """DPM-Solver++ is deterministic given x_T, so folded-carry parity is
    exact (up to fp reassociation of the boundary reshapes). slow: two
    whole-model 4-step sampler scans (~67 s on a loaded 1-core box)."""
    gd, params, cond, shape = _setup()
    rng = jax.random.PRNGKey(9)
    x_t = jax.random.normal(jax.random.PRNGKey(10), shape, jnp.float32)
    y1 = gd.dpm_solver_sample(params, rng, shape, cond, sampling_timesteps=4,
                              init_noise=x_t)
    y2 = gd.dpm_solver_sample(params, rng, shape, cond, sampling_timesteps=4,
                              init_noise=x_t, fold_io=2)
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_fold_io_plumbing_stub_model():
    """Fast-tier fold_io coverage with a stub denoiser: the fold/unfold
    carry plumbing in gaussian.py (boundary reshapes, folded x_T, folded
    per-step noise gating) is model-independent, so a 1-param linear
    'model' exercises it in seconds instead of the ~80 s whole-model
    compile. Parity must be exact for the deterministic samplers and the
    ancestral sampler must run folded."""
    from noisediff_tpu.models.blocks import fold_width

    b, s = 1, 16
    shape = (b, s, s, 4)

    def stub_apply(p, x, t, cond):
        # rank-preserving, fold-compatible: pure per-pixel affine whose
        # output commutes with fold_width, plus a t-dependent term so the
        # scan carry actually evolves
        return x * p["w"] + cond["clean_img"] * 0.1 \
            + t[:, None, None, None].astype(x.dtype) * 1e-3

    params = {"w": jnp.float32(0.9)}
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), shape),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    # the stub's "clean_img" condition must be folded too when the carry
    # is folded — mirror what NoiseDiffNet's fold_io lowering does
    def stub_apply_folded(p, x, t, c):
        cf = dict(c)
        if x.shape[2] != s:  # folded carry
            cf["clean_img"] = fold_width(c["clean_img"], 2)
        return stub_apply(p, x, t, cf)

    gd = GaussianDiffusion(
        apply_fn=stub_apply_folded, schedule=make_schedule("sigmoid2", 8),
        image_size=s, objective="pred_v",
    )
    x_t = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    rng = jax.random.PRNGKey(3)

    y1 = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                        init_noise=x_t)
    y2 = gd.ddim_sample(params, rng, shape, cond, sampling_timesteps=4,
                        init_noise=x_t, fold_io=2)
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)

    d1 = gd.dpm_solver_sample(params, rng, shape, cond,
                              sampling_timesteps=4, init_noise=x_t)
    d2 = gd.dpm_solver_sample(params, rng, shape, cond,
                              sampling_timesteps=4, init_noise=x_t,
                              fold_io=2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)

    a = gd.p_sample_loop(params, rng, shape, cond, init_noise=x_t,
                         fold_io=2)
    assert a.shape == shape
    assert np.isfinite(np.asarray(a)).all()
