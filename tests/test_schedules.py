"""Golden-value tests for the beta schedules and derived diffusion buffers.

Golden values were computed in float64 directly from the published formulas
(DDPM linear; Nichol-Dhariwal cosine; arXiv:2212.11972 sigmoid with the
reference's (start, end, tau) triples) and cross-checked against the torch
reference implementation (denoising_diffusion_pytorch.py:96-164).
"""
import numpy as np
import pytest

from noisediff_tpu.ops import schedules

# name -> (beta[0], beta[499], beta[999], sum(beta), alphas_cumprod[-1]) at T=1000
GOLDEN = {
    "linear": (0.0001, 0.010040040040040041, 0.02, 10.049999999999999, 4.0358297653756754e-05),
    "cosine": (4.128422482196914e-05, 0.0031458862304780677, 0.999, 12.441496417056296, 2.4287669070348542e-09),
    "sigmoid1": (2.9923501629447458e-05, 0.0059936061308364375, 0.99853525864976611, 10.941157946229419, 4.3894484246715721e-08),
    "sigmoid2": (6.6218598615552793e-07, 0.00078160047488240458, 0.999, 9.0714929368837005, 1.953108484376034e-07),
    "sigmoid3": (1.187446108108503e-08, 0.00012485509936432937, 0.999, 8.795831151765233, 2.5442607503122406e-07),
}


@pytest.mark.parametrize("name", list(GOLDEN))
def test_beta_schedule_goldens(name):
    betas = schedules.make_beta_schedule(name, 1000)
    assert betas.dtype == np.float64
    assert betas.shape == (1000,)
    b0, b499, b999, bsum, ac_last = GOLDEN[name]
    np.testing.assert_allclose(betas[0], b0, rtol=1e-9)
    np.testing.assert_allclose(betas[499], b499, rtol=1e-9)
    np.testing.assert_allclose(betas[999], b999, rtol=1e-9)
    np.testing.assert_allclose(betas.sum(), bsum, rtol=1e-9)
    np.testing.assert_allclose(np.cumprod(1 - betas)[-1], ac_last, rtol=1e-9)


def test_sigmoid_alias():
    # CLI default '--beta_schedule sigmoid' resolves to the sigmoid1 triple.
    np.testing.assert_array_equal(
        schedules.make_beta_schedule("sigmoid", 100),
        schedules.make_beta_schedule("sigmoid1", 100),
    )


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        schedules.make_beta_schedule("nope", 10)


def test_derived_buffers_consistency():
    sch = schedules.make_schedule("sigmoid2", 1000)
    # expected values recomputed in float64 from the float64 schedule
    betas = schedules.make_beta_schedule("sigmoid2", 1000)
    ac = np.cumprod(1 - betas)
    acp = np.concatenate([[1.0], ac[:-1]])

    assert sch.num_timesteps == 1000
    assert sch.betas.dtype == np.float32  # float64 host compute, fp32 buffers
    np.testing.assert_allclose(np.asarray(sch.alphas_cumprod_prev)[0], 1.0)
    np.testing.assert_allclose(
        np.asarray(sch.alphas_cumprod_prev)[1:], np.asarray(sch.alphas_cumprod)[:-1]
    )

    # posterior q(x_{t-1} | x_t, x_0) identities (fp32 buffers vs fp64 math)
    np.testing.assert_allclose(
        np.asarray(sch.posterior_variance),
        betas * (1 - acp) / (1 - ac),
        rtol=1e-5,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_recipm1_alphas_cumprod),
        np.sqrt(1.0 / ac - 1.0),
        rtol=2e-5,
        atol=1e-7,
    )

    # min-SNR-style weights: pred_v weight = snr/(snr+1); pred_noise weight = 1
    snr = ac / (1 - ac)
    np.testing.assert_allclose(
        np.asarray(sch.loss_weight("pred_v")), snr / (snr + 1), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sch.loss_weight("pred_noise")), 1.0)
    np.testing.assert_allclose(np.asarray(sch.loss_weight("pred_x0")), snr, rtol=1e-5)


def test_posterior_log_variance_clipped_at_t0():
    sch = schedules.make_schedule("linear", 1000)
    # posterior variance at t=0 is 0 -> clipped log at log(1e-20)
    assert np.isfinite(np.asarray(sch.posterior_log_variance_clipped)).all()
    np.testing.assert_allclose(
        np.asarray(sch.posterior_log_variance_clipped)[0], np.log(1e-20), rtol=1e-6
    )
