"""Host-side raw ingestion: ARW decode, numpy packing, caches, PMN resources.

The reference decodes ARW with rawpy inside every DataLoader worker on every
epoch (SURVEY.md §3.1 'HOT CPU LOOP') and preloads ~11 GB of packed frames
into RAM (dataset_denoising.py:36-43). Here:

  * LibRaw/rawpy runs only at the ingestion edge (and is optional — TPU hosts
    often don't have it); decoded frames are cached as packed .npy and served
    via np.memmap afterwards.
  * A `.npy` sidecar next to an `.ARW` path is picked up transparently, which
    is also how the test-suite fabricates raw trees without LibRaw.
  * numpy packing mirrors ops/raw.py (device variant) — parity pinned by
    tests against the same contract (raw_util.py:17-35).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

try:  # optional at the edge only
    import rawpy  # type: ignore

    HAS_RAWPY = True
except Exception:  # pragma: no cover - environment dependent
    rawpy = None
    HAS_RAWPY = False

BLACK_LEVEL = 512.0
WHITE_POINT = 16383.0
SCALE = WHITE_POINT - BLACK_LEVEL


def np_pack_bayer(im: np.ndarray) -> np.ndarray:
    """(H, W) Bayer -> (H/2, W/2, 4) [R, G1, B, G2] (raw_util.py:30-33)."""
    return np.stack(
        [im[0::2, 0::2], im[0::2, 1::2], im[1::2, 1::2], im[1::2, 0::2]], axis=-1
    )


def np_pack_raw(bayer: np.ndarray, rescale: bool = True) -> np.ndarray:
    im = np.maximum(bayer.astype(np.float32) - BLACK_LEVEL, 0.0)
    if rescale:
        im = im / SCALE
    return np_pack_bayer(im)


def np_unpack_bayer(packed: np.ndarray) -> np.ndarray:
    h, w, _ = packed.shape
    bayer = np.zeros((2 * h, 2 * w), packed.dtype)
    bayer[0::2, 0::2] = packed[..., 0]
    bayer[0::2, 1::2] = packed[..., 1]
    bayer[1::2, 1::2] = packed[..., 2]
    bayer[1::2, 0::2] = packed[..., 3]
    return bayer


def decode_bayer(path: str) -> np.ndarray:
    """Decode a raw file to the (H, W) float32 Bayer DN mosaic.

    Resolution order: literal .npy path -> '<path>.npy' sidecar ->
    '<stem>.npy' sidecar -> rawpy (LibRaw).
    """
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    for cand in (path + ".npy", os.path.splitext(path)[0] + ".npy"):
        if os.path.exists(cand):
            return np.load(cand).astype(np.float32)
    if not HAS_RAWPY:
        raise FileNotFoundError(
            f"{path}: no .npy sidecar found and rawpy is unavailable on this host"
        )
    with rawpy.imread(path) as raw:
        return raw.raw_image_visible.astype(np.float32)


def load_packed(path: str, rescale: bool = True) -> np.ndarray:
    """decode + pack_raw in one host call (native threaded packer when the
    csrc library is built, numpy otherwise)."""
    bayer = decode_bayer(path)
    try:
        from . import native

        if native.available():
            return native.pack_raw(bayer, rescale=rescale)
    except Exception:
        pass
    return np_pack_raw(bayer, rescale=rescale)


class PackedFrameCache:
    """Disk-backed cache of packed clean frames, served as memmaps.

    Replaces the reference's whole-dataset RAM preload
    (dataset_denoising.py:36-43): first access converts ARW -> packed float32
    .npy under cache_dir; subsequent access memory-maps (the OS page cache
    keeps the hot set resident without an 11 GB python heap).
    """

    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = cache_dir
        self._mem: Dict[str, np.ndarray] = {}
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def get(self, path: str) -> np.ndarray:
        key = os.path.basename(path).split(".ARW")[0].split(".npy")[0]
        if key in self._mem:
            return self._mem[key]
        if self.cache_dir:
            cpath = os.path.join(self.cache_dir, key + ".packed.npy")
            if not os.path.exists(cpath):
                np.save(cpath, load_packed(path))
            arr = np.load(cpath, mmap_mode="r")
        else:
            arr = load_packed(path)
        self._mem[key] = arr
        return arr


def extract_iso_from_exif(path: str) -> Optional[int]:
    """EXIF ISO tag (raw_util.py:142-158); returns None if exifread missing."""
    try:
        import exifread  # type: ignore
    except Exception:  # pragma: no cover
        return None
    try:
        with open(path, "rb") as f:
            tags = exifread.process_file(f)
        if "EXIF ISOSpeedRatings" in tags:
            return int(str(tags["EXIF ISOSpeedRatings"]))
        return None
    except Exception:
        return None


def metainfo(path: str) -> Tuple[float, float]:
    """(iso, exposure_time) from EXIF (test_denoising.py:302-315).

    Resolution order mirrors decode_bayer: a '<path>.meta.json' /
    '<stem>.meta.json' sidecar ({"iso": ..., "exposure": ...}) wins over
    EXIF — synthetic trees (fixtures, the learning gate) carry no EXIF.
    """
    import json

    for cand in (path + ".meta.json", os.path.splitext(path)[0] + ".meta.json"):
        if os.path.exists(cand):
            with open(cand, "r") as f:
                m = json.load(f)
            return float(m["iso"]), float(m["exposure"])

    import exifread  # required for ELD eval; fail loudly if absent

    with open(path, "rb") as f:
        tags = exifread.process_file(f)
    suffix = os.path.splitext(os.path.basename(path))[1]
    if suffix == ".dng":
        expo = eval(str(tags["Image ExposureTime"]))  # noqa: S307 - exif fraction
        iso = eval(str(tags["Image ISOSpeedRatings"]))  # noqa: S307
    else:
        expo = eval(str(tags["EXIF ExposureTime"]))  # noqa: S307
        iso = eval(str(tags["EXIF ISOSpeedRatings"]))  # noqa: S307
    return iso, expo


def modify_raw_file(raw_file: str, tab: np.ndarray, position, out_file: str) -> None:
    """Write a uint16 plane back into an ARW/DNG byte stream
    (raw_util.py:324-348): the mosaic occupies the trailing l*c*2 bytes of an
    uncompressed Sony file; everything before it is copied as the header."""
    import rawpy  # required: needs the real file's geometry

    with rawpy.imread(raw_file) as raw:
        l, c = raw.raw_image.shape
    with open(raw_file, "rb") as f:
        blob = f.read()
    mosaic = np.frombuffer(blob[-l * c * 2 :], dtype=np.uint16).reshape(l, c).copy()
    header = blob[: -l * c * 2]
    y, x = position
    mosaic[y : y + tab.shape[0], x : x + tab.shape[1]] = tab
    with open(out_file, "wb") as f:
        f.write(header)
        f.write(mosaic.tobytes())


def vis_raw_file(raw_file, save_path: str, save_file: bool = True) -> np.ndarray:
    """LibRaw postprocess to sRGB (raw_util.py:351-373)."""
    import rawpy
    from PIL import Image

    raw = rawpy.imread(raw_file) if isinstance(raw_file, str) else raw_file
    rgb = raw.postprocess(
        use_camera_wb=True, half_size=False, no_auto_bright=True, output_bps=16
    )
    rgb = np.clip(np.float32(rgb / 65535.0) * 255.0, 0, 255)
    if save_file:
        Image.fromarray(rgb.astype(np.uint8)).save(save_path)
    return rgb


class Darkshading:
    """PMN dark-shading resources (raw_util.py:87-109).

    resources/: darkshading_{high,low}ISO_{k,b}.npy + darkshading_BLE.pkl.
    Returns full-resolution Bayer-domain maps: ds_k*iso + ds_b + BLE[iso],
    with the high/low branch split at ISO 1600.
    """

    def __init__(self, resources_path: str):
        self.resources_path = resources_path
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        rp = self.resources_path
        with open(os.path.join(rp, "darkshading_BLE.pkl"), "rb") as f:
            self.blc_mean = pickle.load(f)
        self.ds_k_high = np.load(os.path.join(rp, "darkshading_highISO_k.npy"), allow_pickle=True)
        self.ds_b_high = np.load(os.path.join(rp, "darkshading_highISO_b.npy"), allow_pickle=True)
        self.ds_k_low = np.load(os.path.join(rp, "darkshading_lowISO_k.npy"), allow_pickle=True)
        self.ds_b_low = np.load(os.path.join(rp, "darkshading_lowISO_b.npy"), allow_pickle=True)
        self._loaded = True

    def get(self, iso: int) -> np.ndarray:
        self._load()
        if iso > 1600:
            ds_k, ds_b = self.ds_k_high, self.ds_b_high
        else:
            ds_k, ds_b = self.ds_k_low, self.ds_b_low
        return ds_k * iso + ds_b + self.blc_mean[iso]
