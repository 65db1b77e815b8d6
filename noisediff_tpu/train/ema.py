"""Functional EMA with ema-pytorch semantics.

Parity target: the reference trains with ema-pytorch
(`models/trainer_diffusion.py:63-69`): beta=0.995, update_after_step=500,
update_every=20 (the inline comment claims 10 — quirk noted in SURVEY.md §7).

ema-pytorch behaviour reproduced here:
  * `update()` is called once per optimiser step; only every `update_every`-th
    call does anything;
  * while step <= update_after_step the EMA is a straight copy of the online
    params;
  * afterwards the decay ramps as 1 - (1 + epoch/inv_gamma)^(-power) with
    epoch = step - update_after_step - 1, clamped to [min_value, beta]
    (defaults inv_gamma=1, power=2/3, min_value=0).

Implemented as a branch-free pytree update so it lives inside the jitted
train step: copy == lerp with decay 0; skipped calls == lerp with decay 1.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmaState:
    params: Any
    step: jnp.ndarray  # int32 counter of update() calls

    @classmethod
    def create(cls, params):
        # materialise fresh buffers: sharing the online params' buffers would
        # make jit donation see the same buffer twice (donate(a), donate(a))
        return cls(
            params=jax.tree.map(jnp.copy, params), step=jnp.zeros((), jnp.int32)
        )


def ema_update(
    state: EmaState,
    online_params,
    *,
    beta: float = 0.995,
    update_after_step: int = 500,
    update_every: int = 20,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EmaState:
    step = state.step
    apply = (step % update_every) == 0

    epoch = jnp.clip(step - update_after_step - 1, 0).astype(jnp.float32)
    ramp = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    decay = jnp.where(epoch <= 0, 0.0, jnp.clip(ramp, min_value, beta))
    copy_phase = step <= update_after_step
    decay = jnp.where(copy_phase, 0.0, decay)
    # skipped calls keep the EMA unchanged == decay 1
    decay = jnp.where(apply, decay, 1.0)

    new_params = jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.params,
        online_params,
    )
    return EmaState(params=new_params, step=step + 1)
