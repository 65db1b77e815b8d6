"""ctypes bindings for the C++ host data-plane (csrc/noisediff_host.cpp).

The native library supplies fused, multithreaded Bayer pack/unpack and the
one-pass training-pair kernel; every entry point has a numpy fallback so the
framework runs (slower) without the compiled library. The library is built
on demand with `make -C csrc` if a toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libnoisediff_host.so"
_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.join(_CSRC, _LIB_NAME)
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    f32 = ctypes.c_float

    lib.nd_pack_raw.argtypes = [u16p, f32p, i64, i64, f32, f32, ctypes.c_int]
    lib.nd_unpack_raw.argtypes = [f32p, u16p, i64, i64, f32, f32]
    lib.nd_make_noise_pair.argtypes = [
        u16p, u16p, f32p, f32p, f32p, i64, i64, i64, i64, i64, i64, f32, f32, f32,
    ]
    lib.nd_pack_raw_batch.argtypes = [u16p, f32p, i64, i64, i64, f32, f32, ctypes.c_int]
    lib.nd_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_raw(
    bayer: np.ndarray, rescale: bool = True, black: float = 512.0, white: float = 16383.0
) -> np.ndarray:
    """Native (or numpy-fallback) Bayer pack — contract of raw_util.py:17-35."""
    lib = _load()
    bayer16 = np.ascontiguousarray(bayer, dtype=np.uint16)
    H, W = bayer16.shape
    if lib is None:
        from .raw_host import np_pack_raw

        return np_pack_raw(bayer16.astype(np.float32), rescale=rescale)
    out = np.empty((H // 2, W // 2, 4), np.float32)
    lib.nd_pack_raw(bayer16, out, H, W, black, white, int(rescale))
    return out


def unpack_raw(
    packed: np.ndarray, black: float = 512.0, white: float = 16383.0
) -> np.ndarray:
    lib = _load()
    packed32 = np.ascontiguousarray(packed, dtype=np.float32)
    h, w, _ = packed32.shape
    if lib is None:
        from .raw_host import SCALE, np_unpack_bayer

        bayer = np_unpack_bayer(packed32) * (white - black) + black
        return np.clip(bayer, 0, white).astype(np.uint16)
    out = np.empty((2 * h, 2 * w), np.uint16)
    lib.nd_unpack_raw(packed32, out, h, w, black, white)
    return out


def make_noise_pair(
    bayer_in: np.ndarray,
    bayer_gt: np.ndarray,
    cy: int,
    cx: int,
    ch: int,
    cw: int,
    ratio: float,
    black: float = 512.0,
    white: float = 16383.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused (noisy, clean, noise) crop triple — the SonyTrainDataset item
    pipeline (dataset.py:119-128) in one pass over the crop region."""
    lib = _load()
    if lib is None:
        from .raw_host import np_pack_raw

        noisy_f = np.clip(
            np_pack_raw(bayer_in.astype(np.float32)) * ratio, 0.0, 1.0
        )[cy : cy + ch, cx : cx + cw]
        clean_f = np_pack_raw(bayer_gt.astype(np.float32))[cy : cy + ch, cx : cx + cw]
        return noisy_f, clean_f, noisy_f - clean_f
    b_in = np.ascontiguousarray(bayer_in, np.uint16)
    b_gt = np.ascontiguousarray(bayer_gt, np.uint16)
    H, W = b_in.shape
    noisy = np.empty((ch, cw, 4), np.float32)
    clean = np.empty((ch, cw, 4), np.float32)
    noise = np.empty((ch, cw, 4), np.float32)
    lib.nd_make_noise_pair(
        b_in, b_gt, noisy, clean, noise, H, W, cy, cx, ch, cw, ratio, black, white
    )
    return noisy, clean, noise
