"""Loss library.

Parity target: reference `models/losses.py` (569 LoC). The shipped trainers
use only L1/MSE (trainer_denoising.py:66-79) and the diffusion MSE lives in
the diffusion core; the rest of the reference library (Charbonnier,
WeightedTV, GAN losses, penalties) is reproduced functionally here. Two
reference classes are intentionally NOT reproduced because they reference
undefined symbols and crash if instantiated (losses.py:162 PerceptualLoss ->
VGGFeatureExtractor; :503 AdversarialLoss -> DiscriminatorS2d_sig — see
SURVEY.md quirks ledger).

All losses are pure functions over NHWC arrays with a `reduction` argument
('none' | 'mean' | 'sum') and an optional elementwise weight, mirroring the
reference's signature surface.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_REDUCTIONS = ("none", "mean", "sum")


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray], reduction: str):
    if reduction not in _REDUCTIONS:
        raise ValueError(f"reduction must be one of {_REDUCTIONS}")
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    return loss.mean()


def l1_loss(pred, target, weight=None, reduction="mean", loss_weight=1.0):
    return loss_weight * _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, reduction="mean", loss_weight=1.0):
    return loss_weight * _reduce((pred - target) ** 2, weight, reduction)


def charbonnier_loss(
    pred, target, weight=None, reduction="mean", loss_weight=1.0, eps=1e-12
):
    """Differentiable L1 variant: sqrt(diff^2 + eps)."""
    return loss_weight * _reduce(
        jnp.sqrt((pred - target) ** 2 + eps), weight, reduction
    )


def weighted_tv_loss(pred, weight=None, loss_weight=1.0):
    """Total variation as L1 of forward differences (NHWC)."""
    wy = weight[:, :-1, :, :] if weight is not None else None
    wx = weight[:, :, :-1, :] if weight is not None else None
    y = l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=wy)
    x = l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=wx)
    return loss_weight * (x + y)


# ---------------------------------------------------------------------------
# GAN losses (reference losses.py:243-411)
# ---------------------------------------------------------------------------

GAN_TYPES = ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge")


def gan_loss(
    pred: jnp.ndarray,
    target_is_real: bool,
    gan_type: str = "vanilla",
    is_disc: bool = False,
    real_label: float = 1.0,
    fake_label: float = 0.0,
    loss_weight: float = 1.0,
):
    """Generator/discriminator objective for the reference's GAN variants."""
    if gan_type == "vanilla":
        label = jnp.full_like(pred, real_label if target_is_real else fake_label)
        loss = optax_sigmoid_bce(pred, label).mean()
    elif gan_type == "lsgan":
        label = jnp.full_like(pred, real_label if target_is_real else fake_label)
        loss = ((pred - label) ** 2).mean()
    elif gan_type == "wgan":
        loss = -pred.mean() if target_is_real else pred.mean()
    elif gan_type == "wgan_softplus":
        loss = (
            jax.nn.softplus(-pred).mean()
            if target_is_real
            else jax.nn.softplus(pred).mean()
        )
    elif gan_type == "hinge":
        if is_disc:
            p = -pred if target_is_real else pred
            loss = jax.nn.relu(1.0 + p).mean()
        else:
            loss = -pred.mean()
    else:
        raise NotImplementedError(f"GAN type {gan_type} is not implemented")
    # generator losses carry loss_weight; discriminator losses don't
    return loss if is_disc else loss * loss_weight


def optax_sigmoid_bce(logits, labels):
    """BCE-with-logits (stable form), matching nn.BCEWithLogitsLoss."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def r1_penalty(real_pred_sum_fn, real_img):
    """R1 gradient penalty: E[||d D(x)/dx||^2] (losses.py gradient penalties)."""
    grad = jax.grad(real_pred_sum_fn)(real_img)
    return (grad ** 2).sum(axis=tuple(range(1, grad.ndim))).mean()


def gradient_penalty(disc_sum_fn, real_img, fake_img, rng, weight=None):
    """WGAN-GP interpolated gradient penalty."""
    alpha = jax.random.uniform(rng, (real_img.shape[0],) + (1,) * (real_img.ndim - 1))
    interp = alpha * real_img + (1 - alpha) * fake_img
    grad = jax.grad(disc_sum_fn)(interp)
    if weight is not None:
        grad = grad * weight
    norm = jnp.sqrt((grad ** 2).sum(axis=tuple(range(1, grad.ndim))) + 1e-12)
    out = ((norm - 1) ** 2).mean()
    if weight is not None:
        out = out / weight.mean()
    return out
