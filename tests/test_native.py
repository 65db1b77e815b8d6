"""C++ host data-plane tests: native pack/unpack/fused-pair vs the numpy
contract (and the fallback path when the library is absent)."""
import numpy as np
import pytest

from noisediff_tpu.data import native
from noisediff_tpu.data.raw_host import np_pack_raw


def _bayer(h=32, w=48, seed=0):
    return (
        np.random.default_rng(seed).integers(0, 16384, size=(h, w)).astype(np.uint16)
    )


def test_native_builds_and_loads():
    assert native.available(), "csrc build failed (g++ toolchain expected)"


def test_pack_matches_numpy():
    b = _bayer()
    got = native.pack_raw(b)
    exp = np_pack_raw(b.astype(np.float32))
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-7)


def test_pack_no_rescale():
    b = _bayer(seed=1)
    got = native.pack_raw(b, rescale=False)
    exp = np_pack_raw(b.astype(np.float32), rescale=False)
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_unpack_roundtrip():
    b = _bayer(seed=2)
    packed = native.pack_raw(b)
    recon = native.unpack_raw(packed)
    np.testing.assert_array_equal(recon, np.maximum(b, 512))


def test_fused_noise_pair():
    b_in = _bayer(seed=3)
    b_gt = _bayer(seed=4)
    ratio = 100.0
    noisy, clean, noise = native.make_noise_pair(b_in, b_gt, 2, 3, 8, 8, ratio)

    noisy_e = np.clip(np_pack_raw(b_in.astype(np.float32)) * ratio, 0, 1)[2:10, 3:11]
    clean_e = np_pack_raw(b_gt.astype(np.float32))[2:10, 3:11]
    np.testing.assert_allclose(noisy, noisy_e, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(clean, clean_e, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(noise, noisy_e - clean_e, rtol=1e-5, atol=1e-6)
