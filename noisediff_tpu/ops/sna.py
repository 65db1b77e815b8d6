"""Shot-Noise Augmentation (PMN) — fully on-device.

Parity targets: reference `models/trainer_denoising.py`:
  get_aug_param_torch :115-138  clamped-gaussian per-channel WB gains
  SNA_torch           :140-166  Poisson brightness-augmentation noise

The reference samples per-sample host tensors and loops over the batch with
torch.distributions.Poisson (:207-217, a HOT CPU+GPU sync loop). Here the
whole augmentation is a batched jnp computation inside the jitted train step:
`jax.random.poisson` over the (B, H, W, 4) tensor, per-sample gains applied
with a mask, per-ISO Kmax from the SonyA7S2 calibration table
(raw_util.py:422-452) gathered with searchsorted.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .raw import SONY_A7S2_ISO_TABLE, sony_kmax_array

# Host-side numpy: creating device arrays at import time would initialise the
# jax backend before the driver's platform selection (the round-1 multichip
# failure). jnp ops inside the traced fns fold these into constants.
_ISO_TABLE = np.asarray(SONY_A7S2_ISO_TABLE)
_KMAX_TABLE = np.asarray(sony_kmax_array())

WP, BL = 16383.0, 512.0


def kmax_for_iso(iso: jnp.ndarray, jitter: jnp.ndarray) -> jnp.ndarray:
    """Per-ISO K = Kmax * (1 + jitter) (trainer_denoising.py:150-152).

    ISOs in the SonyA7S2 table use its Kmax; others fall back to the linear
    K(iso) model 0.0009546*iso - 0.00193 (the reference's unknown-ISO branch).
    """
    iso = iso.astype(jnp.float32)
    iso_table = jnp.asarray(_ISO_TABLE, jnp.float32)
    kmax_table = jnp.asarray(_KMAX_TABLE)
    pos = jnp.searchsorted(iso_table, iso)
    pos = jnp.clip(pos, 0, len(SONY_A7S2_ISO_TABLE) - 1)
    exact = iso_table[pos] == iso
    table_k = kmax_table[pos]
    fallback_k = 0.0009546 * iso - 0.00193
    return jnp.where(exact, table_k, fallback_k) * (1.0 + jitter)


def sample_aug_wb(rng: jax.Array, batch: int) -> jnp.ndarray:
    """Sample per-sample WB gains, channel order (R, G1, B, G2).

    Mirrors get_aug_param_torch: one r in {0.25, 0.5} per batch; with prob 3/4
    gains are clamped gaussians coupled through (1+aug_g); normalised so the
    minimum gain is 0 (:128-132). Returns (B, 4).
    """
    k_r, k_gate, k_g, k_rr, k_bb = jax.random.split(rng, 5)
    r = jax.random.randint(k_r, (), 0, 2).astype(jnp.float32) * 0.25 + 0.25
    u = r
    gate = jax.random.randint(k_gate, (), 0, 4) != 0  # 3/4 of batches augmented

    aug_g = jnp.clip(jax.random.normal(k_g, (batch,)) * r, 0.0, 4 * u)
    aug_r = jnp.clip(
        (1 + jax.random.normal(k_rr, (batch,)) * r) * (1 + aug_g) - 1, 0.0, 4 * u
    )
    aug_b = jnp.clip(
        (1 + jax.random.normal(k_bb, (batch,)) * r) * (1 + aug_g) - 1, 0.0, 4 * u
    )
    zeros = jnp.zeros((batch,))
    aug_r = jnp.where(gate, aug_r, zeros)
    aug_g = jnp.where(gate, aug_g, zeros)
    aug_b = jnp.where(gate, aug_b, zeros)

    daug = jnp.minimum(jnp.minimum(aug_r, aug_g), aug_b)
    daug = jnp.minimum(daug, 0.0)  # daug[daug>0] = 0
    aug_r = (1 + aug_r) / (1 + daug) - 1
    aug_g = (1 + aug_g) / (1 + daug) - 1
    aug_b = (1 + aug_b) / (1 + daug) - 1
    return jnp.stack([aug_r, aug_g, aug_b, aug_g], axis=1)  # R,G1,B,G2 (:210)


def apply_sna(
    rng: jax.Array,
    noisy: jnp.ndarray,
    clean: jnp.ndarray,
    iso: jnp.ndarray,
    ratio: jnp.ndarray,
    aug_wb: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched SNA_torch (:140-166, applied at :207-217).

    noisy/clean: (B, H, W, 4) in [0,1] (ratio-amplified domain);
    iso/ratio: (B,); aug_wb: (B, 4). Samples with all-zero gains pass through
    unchanged (the reference skips them).
    """
    k_jit, k_poi = jax.random.split(rng)
    b = clean.shape[0]
    jitter = jax.random.uniform(k_jit, (b,), minval=-0.01, maxval=0.01)
    K = kmax_for_iso(iso, jitter)  # (B,)

    ratio = ratio.astype(jnp.float32).reshape(b, 1, 1, 1)
    Kb = K.reshape(b, 1, 1, 1)
    wb = aug_wb.reshape(b, 1, 1, 4).astype(jnp.float32)

    gt_dn = clean.astype(jnp.float32) * (WP - BL) / ratio
    dy = gt_dn * wb
    lam = jnp.maximum(dy / Kb, 0.0)
    dn = jax.random.poisson(k_poi, lam).astype(jnp.float32) * Kb
    dy = dy * ratio / (WP - BL)
    dn = dn / (WP - BL) * ratio  # ori=False branch (:163-164)

    active = (jnp.abs(aug_wb).max(axis=1) != 0).reshape(b, 1, 1, 1)
    noisy_out = jnp.where(active, noisy + dn, noisy)
    clean_out = jnp.where(active, clean + dy, clean)
    return noisy_out, clean_out
