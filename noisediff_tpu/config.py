"""Config helpers bridging the reference's argparse flag surface to the
framework's explicit components.

The reference threads one argparse.Namespace through everything (SURVEY.md
§5: 'the flag namespace args is threaded through everything'); the four CLIs
here keep that flag surface (north star: CLIs preserved) and this module
turns the namespace into DataPaths / model / mesh settings. Hard-coded
cluster paths from the reference (dataset.py:22-23, test_denoising.py:27-32)
become the --sid_folder / --synthetic_folder / --resources_path /
--pretrained_dir / --eld_folder flags.
"""
from __future__ import annotations

import math
from argparse import Namespace

from .data.datasets import DataPaths


def paths_from_args(args: Namespace) -> DataPaths:
    g = lambda name, default: getattr(args, name, None) or default
    return DataPaths(
        data_folder=g("sid_folder", "./SID"),
        train_list=getattr(args, "train_list", "") or "",
        test_list=getattr(args, "test_list", "") or "",
        val_list=getattr(args, "val_list", "") or "",
        synthetic_folder=g("synthetic_folder", "./NoiseDiff_GeneratedNoiseData"),
        resources_path=g("resources_path", "./resources"),
        pretrained_dir=g("pretrained_dir", "./pretrained_ckpts"),
        eld_folder=g("eld_folder", "./ELD/testset"),
        eld_val_list=g("eld_val_list", ""),
        eld_test_list=g("eld_test_list", ""),
        cache_dir=getattr(args, "cache_dir", None),
    )


def add_path_flags(parser) -> None:
    parser.add_argument("--sid_folder", default="./SID", type=str,
                        help="SID dataset root (contains Sony/ and the list files)")
    parser.add_argument("--train_list", default="", type=str)
    parser.add_argument("--test_list", default="", type=str)
    parser.add_argument("--val_list", default="", type=str)
    parser.add_argument("--synthetic_folder", default="./NoiseDiff_GeneratedNoiseData", type=str)
    parser.add_argument("--resources_path", default="./resources", type=str,
                        help="PMN darkshading resources")
    parser.add_argument("--pretrained_dir", default="./pretrained_ckpts", type=str)
    parser.add_argument("--eld_folder", default="./ELD/testset", type=str)
    parser.add_argument("--eld_val_list", default="", type=str)
    parser.add_argument("--eld_test_list", default="", type=str)
    parser.add_argument("--cache_dir", default=None, type=str,
                        help="packed-frame cache directory (replaces the RAM preload)")


def data_axis_size(batch_size: int, n_devices: int) -> int:
    """Largest usable data-parallel degree: the batch dim must divide evenly
    across the mesh."""
    if batch_size % n_devices == 0:
        return n_devices
    return math.gcd(batch_size, n_devices)
