"""Tests for the rawpy/exifread-gated raw_host tail (EXIF ISO, metainfo,
modify_raw_file byte surgery, vis_raw_file scaling) using stub modules that
mimic the third-party APIs — neither rawpy nor exifread is installed in this
image, but the logic around them (reference raw_util.py:142-158, 324-373,
test_denoising.py:302-315) is ours to verify.
"""
import sys
import types

import numpy as np
import pytest


class _Tag:
    def __init__(self, s):
        self._s = s

    def __str__(self):
        return self._s


def _stub_exifread(monkeypatch, tags):
    mod = types.ModuleType("exifread")
    mod.process_file = lambda f: tags
    monkeypatch.setitem(sys.modules, "exifread", mod)


def test_extract_iso_from_exif(monkeypatch, tmp_path):
    from noisediff_tpu.data import raw_host

    p = tmp_path / "frame.ARW"
    p.write_bytes(b"\x00" * 16)
    _stub_exifread(monkeypatch, {"EXIF ISOSpeedRatings": _Tag("1600")})
    assert raw_host.extract_iso_from_exif(str(p)) == 1600
    _stub_exifread(monkeypatch, {})
    assert raw_host.extract_iso_from_exif(str(p)) is None


def test_metainfo_arw_and_dng_branches(monkeypatch, tmp_path):
    from noisediff_tpu.data import raw_host

    arw = tmp_path / "a.ARW"
    arw.write_bytes(b"\x00")
    _stub_exifread(
        monkeypatch,
        {"EXIF ExposureTime": _Tag("1/30"), "EXIF ISOSpeedRatings": _Tag("800")},
    )
    iso, expo = raw_host.metainfo(str(arw))
    assert iso == 800 and expo == pytest.approx(1 / 30)

    dng = tmp_path / "b.dng"
    dng.write_bytes(b"\x00")
    _stub_exifread(
        monkeypatch,
        {"Image ExposureTime": _Tag("10"), "Image ISOSpeedRatings": _Tag("100")},
    )
    iso, expo = raw_host.metainfo(str(dng))
    assert iso == 100 and expo == 10


def _stub_rawpy(monkeypatch, shape, postprocess_result=None):
    mod = types.ModuleType("rawpy")

    class _Raw:
        raw_image = np.zeros(shape, np.uint16)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def postprocess(self, **kw):
            assert kw == dict(
                use_camera_wb=True, half_size=False, no_auto_bright=True,
                output_bps=16,
            )
            return postprocess_result

    mod.imread = lambda path: _Raw()
    monkeypatch.setitem(sys.modules, "rawpy", mod)


def test_modify_raw_file_roundtrip(monkeypatch, tmp_path):
    """The mosaic occupies the trailing l*c*2 bytes; modify_raw_file must
    splice the tab into position and keep the header byte-identical
    (raw_util.py:324-348)."""
    from noisediff_tpu.data import raw_host

    l, c = 6, 8
    rng = np.random.default_rng(0)
    mosaic = rng.integers(0, 16383, size=(l, c)).astype(np.uint16)
    header = b"SONYHEADER\x01\x02\x03"
    src = tmp_path / "in.ARW"
    src.write_bytes(header + mosaic.tobytes())
    _stub_rawpy(monkeypatch, (l, c))

    tab = np.full((2, 3), 7777, np.uint16)
    dst = tmp_path / "out.ARW"
    raw_host.modify_raw_file(str(src), tab, (1, 2), str(dst))

    blob = dst.read_bytes()
    assert blob[: len(header)] == header
    got = np.frombuffer(blob[len(header):], np.uint16).reshape(l, c)
    want = mosaic.copy()
    want[1:3, 2:5] = 7777
    np.testing.assert_array_equal(got, want)


def test_vis_raw_file_scaling(monkeypatch, tmp_path):
    """postprocess 16-bit output -> float [0,255] (raw_util.py:351-373)."""
    from noisediff_tpu.data import raw_host

    rgb16 = np.array([[[0, 32768, 65535]]], np.uint16)
    _stub_rawpy(monkeypatch, (2, 2), postprocess_result=rgb16)
    out = raw_host.vis_raw_file("whatever.ARW", str(tmp_path / "v.png"),
                                save_file=False)
    np.testing.assert_allclose(
        out[0, 0], [0.0, 32768 / 65535 * 255.0, 255.0], rtol=1e-6
    )
