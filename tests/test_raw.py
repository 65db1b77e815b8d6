"""Parity tests for the raw Bayer ISP ops against reference semantics.

The reference implementations (utils/raw_util.py) are plain numpy; each test
re-derives the expected result with independent numpy slicing so the jnp ops
are checked against the *contract*, not against copied code.
"""
import numpy as np
import jax.numpy as jnp

from noisediff_tpu.ops import raw


def _bayer(h=8, w=12, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 16384, size=(h, w)).astype(np.float32)


def _pack_ref(im):
    """Independent numpy packing in R,G1,B,G2 order (raw_util.py:30-33)."""
    return np.stack(
        [im[0::2, 0::2], im[0::2, 1::2], im[1::2, 1::2], im[1::2, 0::2]], axis=-1
    )


def test_pack_raw_matches_reference_semantics():
    bayer = _bayer()
    expected = _pack_ref(np.maximum(bayer - 512, 0) / (16383 - 512))
    got = np.asarray(raw.pack_raw(jnp.asarray(bayer)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pack_raw_no_rescale():
    bayer = _bayer(seed=1)
    expected = _pack_ref(np.maximum(bayer - 512, 0))
    got = np.asarray(raw.pack_raw(jnp.asarray(bayer), rescale=False))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pack_raw_withoutclip():
    bayer = _bayer(seed=2)
    expected = _pack_ref(bayer / 16383.0)
    got = np.asarray(raw.pack_raw_withoutclip(jnp.asarray(bayer)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pack_unpack_roundtrip():
    bayer = _bayer(seed=3)
    packed = raw.pack_raw(jnp.asarray(bayer))
    recon = np.asarray(raw.unpack_raw(packed))
    # values below black level were clipped by pack; everything else round-trips
    expected = np.maximum(bayer, 512).astype(np.uint16)
    np.testing.assert_array_equal(recon, expected)
    assert recon.dtype == np.uint16


def test_unpack_to_bayer_positions():
    """Channel c of the packed image must land at its Bayer phase."""
    packed = np.zeros((2, 3, 4), np.float32)
    packed[..., 0] = 1  # R  -> even row, even col
    packed[..., 1] = 2  # G1 -> even row, odd col
    packed[..., 2] = 3  # B  -> odd row, odd col
    packed[..., 3] = 4  # G2 -> odd row, even col
    bayer = np.asarray(raw.unpack_to_bayer(jnp.asarray(packed)))
    assert bayer.shape == (4, 6)
    assert (bayer[0::2, 0::2] == 1).all()
    assert (bayer[0::2, 1::2] == 2).all()
    assert (bayer[1::2, 1::2] == 3).all()
    assert (bayer[1::2, 0::2] == 4).all()


def test_pack_batched():
    b = np.stack([_bayer(seed=4), _bayer(seed=5)])
    packed = np.asarray(raw.pack_raw(jnp.asarray(b)))
    assert packed.shape == (2, 4, 6, 4)
    np.testing.assert_allclose(
        packed[1], np.asarray(raw.pack_raw(jnp.asarray(b[1]))), rtol=1e-6
    )


def test_darkshading_model():
    h, w = 6, 8
    rng = np.random.default_rng(7)
    ds_k = rng.normal(size=(h, w)).astype(np.float32)
    ds_b = rng.normal(size=(h, w)).astype(np.float32)
    iso, ble = 1600.0, 0.25
    got = np.asarray(
        raw.darkshading_from_kb(jnp.asarray(ds_k), jnp.asarray(ds_b), iso, ble)
    )
    np.testing.assert_allclose(got, ds_k * iso + ds_b + ble, rtol=1e-5)


def test_pack_raw_withdarkshading_pipeline():
    """Mirror raw_util.py:112-139 step by step in numpy."""
    bayer = _bayer(h=8, w=8, seed=8)
    ds = np.random.default_rng(9).normal(0, 2, size=(8, 8)).astype(np.float32)
    ratio = 100.0

    im = (bayer - 512) / (16383 - 512)
    im = np.clip(im * ratio, 0, 1)
    im = im / ratio
    im = np.clip(im * (16383 - 512) + 512, 0, 16383)
    im = im - ds
    expected = _pack_ref(im)
    expected = np.maximum(expected - 512, 0) / (16383 - 512)

    got = np.asarray(
        raw.pack_raw_withdarkshading(jnp.asarray(bayer), jnp.asarray(ds), ratio)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_remove_darkshading_packed_matches_dataset_semantics():
    """Mirror dataset_denoising.py:80-118 in numpy (HWC layout here)."""
    rng = np.random.default_rng(10)
    h = w = 8
    packed = rng.uniform(0, 1, size=(h, w, 4)).astype(np.float32)
    ds_patch = rng.normal(0, 2, size=(2 * h, 2 * w)).astype(np.float32)
    ratio = 250.0

    # independent numpy pipeline
    bay = np.zeros((2 * h, 2 * w), np.float32)
    bay[0::2, 0::2] = packed[..., 0]
    bay[0::2, 1::2] = packed[..., 1]
    bay[1::2, 1::2] = packed[..., 2]
    bay[1::2, 0::2] = packed[..., 3]
    bay = bay / ratio
    bay = np.clip(bay * (16383 - 512) + 512, 0, 16383)
    bay = bay - ds_patch
    exp = _pack_ref(bay)
    exp = np.maximum(exp - 512, 0) / (16383 - 512)
    exp = np.clip(exp * ratio, 0, 1)

    got = np.asarray(
        raw.remove_darkshading_packed(
            jnp.asarray(packed), jnp.asarray(ds_patch), ratio
        )
    )
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)


def test_camera_tables():
    p = raw.get_camera_noisy_params("SonyA7S2_lowISO")
    assert p["wp"] == 16383 and p["bl"] == 512
    assert raw.get_camera_noisy_params("unknown")["Kmin"] == 1.2  # NikonD850 fallback

    pm = raw.get_camera_noisy_params_max("SonyA7S2_800")
    assert pm["Kmax"] == 0.76504
    assert pm["wp"] == 16383 and pm["bl"] == 512
    assert raw.get_camera_noisy_params_max("SonyA7S2_123") is None
    assert raw.get_camera_noisy_params_max("NikonD850") is None
    assert raw.get_camera_noisy_params_max("IMX686_6400")["wp"] == 1023

    kmax = raw.sony_kmax_array()
    assert kmax.shape == (28,)
    # Kmax scales linearly with ISO: Kmax(iso) = 0.0009563 * iso
    isos = raw.SONY_A7S2_ISO_TABLE.astype(np.float64)
    np.testing.assert_allclose(kmax, 0.0009563 * isos, rtol=1e-4)
