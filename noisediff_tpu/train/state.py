"""TrainState and jit-compiled train steps for both stages.

Replaces the reference's Trainer internals (optimizer step, EMA update, DDP
gradient sync — trainer_diffusion.py:176-191, trainer_denoising.py:207-240)
with one functional step compiled over the device mesh: the gradient
all-reduce is implicit in jit's partitioning of the batch axis; EMA and
(for the denoiser) SNA run inside the same compilation.

Optimizer: Adam with torch-default betas (0.9, 0.999) / eps 1e-8 and the
reference's weight_decay-through-gradient semantics; the learning rate is a
hyperparameter injected per-epoch by the host loop (the reference steps its
schedulers per epoch — see schedules.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.gaussian import GaussianDiffusion
from ..models.blocks import gn_train_trace
from ..ops import sna as sna_ops
from .ema import EmaState, ema_update


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: Optional[EmaState] = None


def make_optimizer(weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent with injectable LR.

    torch Adam's weight_decay adds wd*param to the gradient *before* the
    moment updates (not AdamW), hence add_decayed_weights first.
    """
    def make(learning_rate):
        tx = []
        if weight_decay:
            tx.append(optax.add_decayed_weights(weight_decay))
        tx.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        tx.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*tx)

    return optax.inject_hyperparams(make)(learning_rate=1e-4)


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR (host-side, between epochs).

    The replacement array must match the old leaf's sharding/commitment:
    a fresh uncommitted scalar changes the jitted train step's input
    signature and forces a ~70s recompile at every epoch boundary."""
    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, jnp.float32)
    sharding = getattr(old, "sharding", None)
    if sharding is not None:
        if jax.process_count() > 1:
            # device_put(host_scalar, multi-process sharding) runs an
            # assert_equal allgather every epoch; build the replicated
            # global array from the local value instead (lr is computed
            # identically on every rank from the shared epoch counter)
            import numpy as np

            new = jax.make_array_from_process_local_data(
                sharding, np.asarray(lr, np.float32)
            )
        else:
            new = jax.device_put(new, sharding)
    opt_state.hyperparams["learning_rate"] = new
    return opt_state


def create_train_state(
    params, optimizer: optax.GradientTransformation, with_ema: bool = True
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema=EmaState.create(params) if with_ema else None,
    )


# ---------------------------------------------------------------------------
# Diffusion train step (stage 1)
# ---------------------------------------------------------------------------

def make_diffusion_train_step(
    diffusion: GaussianDiffusion,
    optimizer: optax.GradientTransformation,
    generation_result: str = "noise",
    ema_kwargs: Optional[dict] = None,
    donate: bool = True,
    ema_in_step: bool = True,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch keys (NHWC): 'noise', 'noisy_img', 'clean_img', 'coord',
    'iso_ratio_idx'. generation_result selects the diffusion target
    (trainer_diffusion.py:178-181).

    ema_in_step=False only bumps the EMA call counter inside the step (the
    params pass through the donation unchanged); the caller owns the
    every-20th-call lerp via ema.HostEma — the reference's own host-side
    gating (trainer_diffusion.py:191), saving the ~22 ms/step full-tree
    EMA read+write the fused form pays on every skipped call.
    """
    ema_kwargs = ema_kwargs or {}
    target_key = {"noise": "noise", "image": "noisy_img"}[generation_result]

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        condition = {
            "clean_img": batch["clean_img"],
            "iso_ratio_idx": batch["iso_ratio_idx"],
            "position": batch["coord"],
        }

        def loss_fn(params):
            return diffusion.loss(params, rng, batch[target_key], condition)

        # gn_train_trace: trace-time marker enabling the train-only Pallas
        # GN-stats kernels (models/blocks._gn_stats_pallas_mode) — a +28%
        # step-time win at crop 512 that LOSES ~6.5%/eval in generation
        with gn_train_trace():
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if state.ema is None:
            ema = None
        elif ema_in_step:
            ema = ema_update(state.ema, params, **ema_kwargs)
        else:
            ema = state.ema.replace(step=state.ema.step + 1)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        metrics = {
            "diffusion_loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Denoising train step (stage 2)
# ---------------------------------------------------------------------------

def make_denoising_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    loss_l1: bool = True,
    loss_mse: bool = False,
    lambda_l1: float = 1.0,
    lambda_mse: float = 1.0,
    use_sna: bool = False,
    augment_flip: bool = True,
    donate: bool = True,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    Inside the compiled step (vs the reference's host-side loops):
      * random horizontal flip (trainer_denoising.py:105-111);
      * SNA (batched, :207-217);
      * L1/MSE losses (:225-235).
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        k_flip, k_wb, k_sna = jax.random.split(rng, 3)
        noisy = batch["noisy_img"]
        clean = batch["clean_img"]

        if augment_flip:
            # the reference flips NCHW dim 2 == HEIGHT (trainer_denoising.py
            # :107-110); NHWC equivalent is axis 1
            flip = jax.random.bernoulli(k_flip)
            noisy = jnp.where(flip, noisy[:, ::-1, :, :], noisy)
            clean = jnp.where(flip, clean[:, ::-1, :, :], clean)

        if use_sna:
            aug_wb = sna_ops.sample_aug_wb(k_wb, clean.shape[0])
            noisy, clean = sna_ops.apply_sna(
                k_sna, noisy, clean, batch["iso"], batch["ratio"], aug_wb
            )

        def loss_fn(params):
            out = apply_fn(params, noisy).astype(jnp.float32)
            metrics = {}
            loss = 0.0
            if loss_mse:
                m = jnp.mean((out - clean) ** 2) * lambda_mse
                metrics["mse_loss"] = m
                loss = loss + m
            if loss_l1:
                l = jnp.mean(jnp.abs(out - clean)) * lambda_l1
                metrics["l1_loss"] = l
                loss = loss + l
            metrics["loss_sum"] = loss
            return loss, metrics

        with gn_train_trace():
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params) if state.ema else None
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
