"""Shot-Noise Augmentation tests: gain-sampling invariants and the Poisson
noise statistics of the batched device-side SNA."""
import jax
import jax.numpy as jnp
import numpy as np

from noisediff_tpu.ops import sna
from noisediff_tpu.ops.raw import get_camera_noisy_params_max


def test_sample_aug_wb_invariants():
    ok_zero = False
    ok_pos = False
    for seed in range(40):
        wb = np.asarray(sna.sample_aug_wb(jax.random.PRNGKey(seed), 8))
        assert wb.shape == (8, 4)
        # channel order R,G1,B,G2: the two green gains are identical
        np.testing.assert_array_equal(wb[:, 1], wb[:, 3])
        # gains normalised so min >= 0 (get_aug_param_torch:128-132)
        assert (wb.min(axis=1) >= -1e-6).all()
        if np.abs(wb).max() == 0:
            ok_zero = True  # the 1/4 pass-through branch
        if wb.max() > 0:
            ok_pos = True
    assert ok_zero and ok_pos


def test_kmax_lookup():
    isos = jnp.array([100, 800, 25600])
    k = np.asarray(sna.kmax_for_iso(isos, jnp.zeros(3)))
    for i, iso in enumerate([100, 800, 25600]):
        expected = get_camera_noisy_params_max(f"SonyA7S2_{iso}")["Kmax"]
        np.testing.assert_allclose(k[i], expected, rtol=1e-6)
    # unknown ISO falls back to the linear K(iso) model
    k_unknown = float(sna.kmax_for_iso(jnp.array([3000]), jnp.zeros(1))[0])
    np.testing.assert_allclose(k_unknown, 0.0009546 * 3000 - 0.00193, rtol=1e-5)


def test_apply_sna_statistics():
    """dn is Poisson(dy_dn/K)*K scaled back: mean(dn) == dy (the brightness
    shift), var scales with K. Also: zero-gain samples pass through."""
    b, s = 2, 64
    clean = jnp.full((b, s, s, 4), 0.2, jnp.float32)
    noisy = jnp.full((b, s, s, 4), 0.25, jnp.float32)
    iso = jnp.array([800, 800])
    ratio = jnp.array([100.0, 100.0])
    aug_wb = jnp.stack(
        [jnp.array([0.5, 0.25, 0.4, 0.25]), jnp.zeros(4)], axis=0
    )

    noisy2, clean2 = sna.apply_sna(
        jax.random.PRNGKey(0), noisy, clean, iso, ratio, aug_wb
    )
    noisy2, clean2 = np.asarray(noisy2), np.asarray(clean2)

    # sample 1 has zero gains: untouched
    np.testing.assert_array_equal(noisy2[1], np.asarray(noisy)[1])
    np.testing.assert_array_equal(clean2[1], np.asarray(clean)[1])

    # sample 0: clean shifted deterministically by dy = clean * wb
    dy = 0.2 * np.array([0.5, 0.25, 0.4, 0.25])
    np.testing.assert_allclose(clean2[0].mean(axis=(0, 1)), 0.2 + dy, rtol=1e-4)
    # noisy shifted stochastically with matching mean (Poisson mean == lam)
    dn_mean = noisy2[0].mean(axis=(0, 1)) - 0.25
    np.testing.assert_allclose(dn_mean, dy, rtol=0.05)
    # and is genuinely stochastic
    assert noisy2[0].std(axis=(0, 1)).min() > 0
