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

import flax.linen as nn
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


def gradient_penalty(disc_sum_fn, real_img, fake_img, rng, weight=None,
                     channel_axis=-1):
    """WGAN-GP interpolated gradient penalty (losses.py:377-411).

    The reference norms the gradient over dim 1 only — the channel axis of
    its NCHW tensors (`gradients.norm(2, dim=1)`), keeping the spatial axes
    in the `.mean()`. NHWC arrays here norm over `channel_axis` (default
    last) for the same semantics."""
    alpha = jax.random.uniform(rng, (real_img.shape[0],) + (1,) * (real_img.ndim - 1))
    interp = alpha * real_img + (1 - alpha) * fake_img
    grad = jax.grad(disc_sum_fn)(interp)
    if weight is not None:
        grad = grad * weight
    norm = jnp.sqrt((grad ** 2).sum(axis=channel_axis) + 1e-12)
    out = ((norm - 1) ** 2).mean()
    if weight is not None:
        out = out / weight.mean()
    return out


def g_path_regularize(gen_fn, latents, mean_path_length, rng, decay=0.01):
    """StyleGAN2 path-length regulariser (reference losses.py:362-374).

    Functional form of the torch original: `gen_fn(latents) -> fake_img`
    (NHWC) replaces the implicit autograd graph; the Jacobian-vector
    contraction grad_latents[(fake*noise).sum()] is one vjp call.
    `latents` is (B, n_latents, latent_dim); reductions match the reference
    exactly (sum over dim 2, mean over dim 1).

    Returns (path_penalty, mean(path_lengths), new_mean_path_length)."""
    fake_img, vjp = jax.vjp(gen_fn, latents)
    h, w = fake_img.shape[1], fake_img.shape[2]  # NHWC spatial dims
    noise = jax.random.normal(rng, fake_img.shape, fake_img.dtype) / jnp.sqrt(
        jnp.asarray(h * w, fake_img.dtype)
    )
    grad = vjp(noise)[0]
    path_lengths = jnp.sqrt((grad ** 2).sum(2).mean(1))
    # NB: the reference does NOT detach path_mean inside the penalty — the
    # gradient flows through both terms; only the returned stats are detached.
    path_mean = mean_path_length + decay * (path_lengths.mean() - mean_path_length)
    path_penalty = ((path_lengths - path_mean) ** 2).mean()
    return (
        path_penalty,
        jax.lax.stop_gradient(path_lengths.mean()),
        jax.lax.stop_gradient(path_mean),
    )


class VGGStyleDiscriminator160(nn.Module):
    """VGG-style discriminator, input 160x160 NHWC (reference
    losses.py:414-492: 5 stride-2 stages 160->5, BatchNorm after every conv
    except conv0_0, LeakyReLU(0.2), two linears 512*5*5 -> 100 -> 1).

    Structured so torch weights map 1:1: convs are OIHW->HWIO transposes,
    the flatten before linear1 goes through NCHW order."""

    num_in_ch: int = 4 * 2
    num_feat: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] == 160 and x.shape[2] == 160, (
            f"Input spatial size must be 160x160, but received {x.shape}."
        )
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        nf = self.num_feat
        conv = lambda f, k, s, bias, name: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding=[(1, 1), (1, 1)], use_bias=bias, name=name
        )

        feat = lrelu(conv(nf, 3, 1, True, "conv0_0")(x))
        feat = lrelu(norm("bn0_1")(conv(nf, 4, 2, False, "conv0_1")(feat)))  # 80
        feat = lrelu(norm("bn1_0")(conv(nf * 2, 3, 1, False, "conv1_0")(feat)))
        feat = lrelu(norm("bn1_1")(conv(nf * 2, 4, 2, False, "conv1_1")(feat)))  # 40
        feat = lrelu(norm("bn2_0")(conv(nf * 4, 3, 1, False, "conv2_0")(feat)))
        feat = lrelu(norm("bn2_1")(conv(nf * 4, 4, 2, False, "conv2_1")(feat)))  # 20
        feat = lrelu(norm("bn3_0")(conv(nf * 8, 3, 1, False, "conv3_0")(feat)))
        feat = lrelu(norm("bn3_1")(conv(nf * 8, 4, 2, False, "conv3_1")(feat)))  # 10
        feat = lrelu(norm("bn4_0")(conv(nf * 8, 3, 1, False, "conv4_0")(feat)))
        feat = lrelu(norm("bn4_1")(conv(nf * 8, 4, 2, False, "conv4_1")(feat)))  # 5

        # torch flattens NCHW: (B, C, 5, 5) -> (B, C*25)
        feat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100, name="linear1")(feat))
        return nn.Dense(1, name="linear2")(feat)
