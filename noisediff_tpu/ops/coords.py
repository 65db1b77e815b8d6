"""Coordinate grids used for the positional conditioning.

Parity target: `utils/util.py:138-147` (make_coord) — a (H, W, 2) grid whose
channel 0 is the row coordinate and channel 1 the column coordinate, each in
[0, 1] when rescale=True (divided by (dim - 1)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_coord(h: int, w: int, rescale: bool = False) -> np.ndarray:
    """Host (numpy) coordinate grid, shape (H, W, 2) float32, [row, col] order."""
    seq1 = np.arange(h, dtype=np.float32)
    seq2 = np.arange(w, dtype=np.float32)
    if rescale:
        seq1 = seq1 / (h - 1)
        seq2 = seq2 / (w - 1)
    yy, xx = np.meshgrid(seq1, seq2, indexing="ij")
    return np.stack([yy, xx], axis=-1)


def make_coord_jnp(h: int, w: int, rescale: bool = False) -> jnp.ndarray:
    """Device coordinate grid (same semantics as make_coord)."""
    seq1 = jnp.arange(h, dtype=jnp.float32)
    seq2 = jnp.arange(w, dtype=jnp.float32)
    if rescale:
        seq1 = seq1 / (h - 1)
        seq2 = seq2 / (w - 1)
    yy, xx = jnp.meshgrid(seq1, seq2, indexing="ij")
    return jnp.stack([yy, xx], axis=-1)


def crop_coord_patch(
    full_h: int, full_w: int, y: int, x: int, h: int, w: int
) -> np.ndarray:
    """Coordinate patch for a crop at (y, x) of a (full_h, full_w) image.

    Equivalent to make_coord(full_h, full_w, rescale=True)[y:y+h, x:x+w] but
    O(h*w): the grid is affine in the pixel index.
    """
    seq1 = (np.arange(y, y + h, dtype=np.float32)) / (full_h - 1)
    seq2 = (np.arange(x, x + w, dtype=np.float32)) / (full_w - 1)
    yy, xx = np.meshgrid(seq1, seq2, indexing="ij")
    return np.stack([yy, xx], axis=-1)
