import numpy as np

from noisediff_tpu.ops import coords


def test_make_coord_shape_and_values():
    c = coords.make_coord(4, 10, rescale=True)
    assert c.shape == (4, 10, 2)
    # channel 0: row coordinate, constant along columns
    np.testing.assert_allclose(c[:, 0, 0], np.arange(4) / 3)
    np.testing.assert_allclose(c[0, :, 1], np.arange(10) / 9)
    assert c[..., 0].max() == 1.0 and c[..., 1].max() == 1.0


def test_make_coord_no_rescale():
    c = coords.make_coord(3, 5)
    np.testing.assert_allclose(c[:, 0, 0], np.arange(3, dtype=np.float32))


def test_jnp_matches_numpy():
    np.testing.assert_allclose(
        np.asarray(coords.make_coord_jnp(6, 7, rescale=True)),
        coords.make_coord(6, 7, rescale=True),
        rtol=1e-6,
    )


def test_crop_coord_patch():
    full = coords.make_coord(32, 48, rescale=True)
    patch = coords.crop_coord_patch(32, 48, y=5, x=10, h=8, w=8)
    np.testing.assert_allclose(patch, full[5:13, 10:18], rtol=1e-6)
