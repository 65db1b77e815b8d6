"""DPM-Solver++(2M) sampler tests: convergence to the analytic posterior mean
on a linear-Gaussian model, terminal behaviour, and step-count efficiency vs
DDIM on the same toy problem."""
import jax
import jax.numpy as jnp
import numpy as np

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.ops.schedules import make_schedule


def _gd(apply_fn, T=1000, s=8, objective="pred_x0"):
    return GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", T),
        image_size=s,
        objective=objective,
    )


def test_terminal_step_returns_x0():
    gd = _gd(lambda p, x, t, c: jnp.zeros_like(x))
    out = jax.jit(
        lambda r: gd.dpm_solver_sample({}, r, (2, 8, 8, 4), None, sampling_timesteps=4)
    )(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_converges_to_constant_target():
    """A model that always predicts x0 = 0.37: the deterministic ODE solution
    collapses to that constant. Few DPM steps must land close."""
    target = 0.37

    def apply_fn(params, x, t, c):
        return jnp.full_like(x, target)  # pred_x0 head

    gd = _gd(apply_fn, objective="pred_x0")
    out = np.asarray(
        jax.jit(
            lambda r: gd.dpm_solver_sample({}, r, (1, 8, 8, 4), None, sampling_timesteps=8)
        )(jax.random.PRNGKey(1))
    )
    np.testing.assert_allclose(out, target, rtol=1e-3, atol=1e-3)


def test_dpm_matches_ddim_limit_on_linear_model():
    """For x0-prediction that is *linear* in x (here: constant), DDIM(eta=0)
    and DPM-Solver++ integrate the same ODE — with many steps they agree."""
    target = -0.2

    def apply_fn(params, x, t, c):
        return jnp.full_like(x, target)

    gd = _gd(apply_fn, objective="pred_x0")
    rng = jax.random.PRNGKey(2)
    shape = (1, 8, 8, 4)
    ddim = np.asarray(gd.ddim_sample({}, rng, shape, None, sampling_timesteps=200, eta=0.0))
    dpm = np.asarray(gd.dpm_solver_sample({}, rng, shape, None, sampling_timesteps=200))
    np.testing.assert_allclose(dpm, ddim, rtol=1e-3, atol=1e-3)


def test_lambda_spacing_converges_and_terminal():
    """lambda-uniform grid: same fixed points as the time grid (terminal x0
    projection; constant-x0 convergence)."""
    target = 0.37

    def apply_fn(params, x, t, c):
        return jnp.full_like(x, target)

    gd = _gd(apply_fn, objective="pred_x0")
    out = np.asarray(
        jax.jit(
            lambda r: gd.dpm_solver_sample(
                {}, r, (1, 8, 8, 4), None, sampling_timesteps=8,
                step_spacing="lambda",
            )
        )(jax.random.PRNGKey(1))
    )
    np.testing.assert_allclose(out, target, rtol=1e-3, atol=1e-3)


def test_lambda_spacing_grid_properties():
    """The lambda grid (the sampler's own construction, _dpm_step_grid) is
    strictly decreasing T-1 -> -1 with `steps` pairs, and its last model
    eval sits at a much lower t (higher log-SNR) than the time-uniform
    grid's — the reason it wins at low step counts."""
    from noisediff_tpu.diffusion.gaussian import _dpm_step_grid

    ac = make_schedule("sigmoid2", 1000).alphas_cumprod
    steps = 15
    times = _dpm_step_grid(ac, steps, "lambda")
    assert len(times) == steps + 1
    assert times[0] == 999 and times[-1] == -1
    assert all(a > b for a, b in zip(times, times[1:])), times
    t_uniform_last = int(np.linspace(-1, 999, steps + 1)[1])  # ~65
    assert times[-2] < t_uniform_last, (times[-2], t_uniform_last)


def test_lambda_grid_never_emits_duplicate_knots():
    """At step counts approaching (or exceeding) T, lambda-target knots
    collide at the low-t floor; the grid must DROP them (a duplicate pair
    has h == 0: a full-cost model eval returning x unchanged), staying
    strictly decreasing for every schedule family."""
    from noisediff_tpu.diffusion.gaussian import _dpm_step_grid

    for name, T in (("sigmoid2", 1000), ("linear", 64), ("cosine", 256)):
        ac = make_schedule(name, T).alphas_cumprod
        for steps in (T // 2, T - 1, T, T + 50):
            times = _dpm_step_grid(ac, steps, "lambda")
            assert times[0] == T - 1 and times[-1] == -1, (name, steps)
            assert all(a > b for a, b in zip(times, times[1:])), (
                name, steps, times[-6:],
            )
            assert len(times) <= steps + 1

    # the sampler itself runs on a deduped (collision-heavy) grid
    gd = _gd(lambda p, x, t, c: jnp.full_like(x, 0.25), T=64)
    out = np.asarray(
        gd.dpm_solver_sample({}, jax.random.PRNGKey(0), (1, 8, 8, 4), None,
                             sampling_timesteps=60, step_spacing="lambda")
    )
    np.testing.assert_allclose(out, 0.25, rtol=1e-3, atol=1e-3)


def test_lambda_spacing_matches_time_spacing_at_high_steps():
    """Both grids integrate the same ODE: with many steps they agree on the
    linear (constant-x0) model."""
    target = -0.2

    def apply_fn(params, x, t, c):
        return jnp.full_like(x, target)

    gd = _gd(apply_fn, objective="pred_x0")
    rng = jax.random.PRNGKey(2)
    shape = (1, 8, 8, 4)
    a = np.asarray(gd.dpm_solver_sample({}, rng, shape, None,
                                        sampling_timesteps=200,
                                        step_spacing="time"))
    b = np.asarray(gd.dpm_solver_sample({}, rng, shape, None,
                                        sampling_timesteps=200,
                                        step_spacing="lambda"))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_bad_spacing_raises():
    gd = _gd(lambda p, x, t, c: jnp.zeros_like(x))
    try:
        gd.dpm_solver_sample({}, jax.random.PRNGKey(0), (1, 8, 8, 4), None,
                             sampling_timesteps=4, step_spacing="quadratic")
    except ValueError as e:
        assert "step_spacing" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_fewer_steps_than_ddim_for_same_error():
    """The 2nd-order solver at 8 steps should be at least as accurate as DDIM
    at 8 steps against the converged solution (constant-x0 toy)."""
    target = 0.5

    def apply_fn(params, x, t, c):
        return jnp.full_like(x, target)

    gd = _gd(apply_fn, objective="pred_x0")
    rng = jax.random.PRNGKey(3)
    shape = (1, 8, 8, 4)
    err_dpm = abs(float(np.asarray(gd.dpm_solver_sample({}, rng, shape, None, sampling_timesteps=8)).mean()) - target)
    err_ddim = abs(float(np.asarray(gd.ddim_sample({}, rng, shape, None, sampling_timesteps=8, eta=0.0)).mean()) - target)
    assert err_dpm <= err_ddim + 1e-4
