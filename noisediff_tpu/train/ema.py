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

Two execution modes, bit-identical results:

  * `ema_update` — branch-free in-jit update (skipped calls are a decay-1
    lerp), fused into the train step. Simple, but every step pays a full
    EMA-tree read+write (~22 ms/step for the 21M-param flagship at crop
    512, BENCH_NOTES round-2) that 19 of 20 calls don't need.
  * `HostEma` — the reference's own host-side gating
    (`models/trainer_diffusion.py:191` skips 19/20 update() calls in
    Python): the train step only bumps the call counter
    (ema_in_step=False in train/state.py) and the host invokes one small
    jitted lerp (`ema_apply`) on the applying calls. Equivalence is
    pinned by tests/test_train.py::test_host_ema_matches_fused.
"""
from __future__ import annotations

import functools
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


def ema_decay(
    step,
    *,
    beta: float = 0.995,
    update_after_step: int = 500,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
):
    """Decay used by an APPLYING update at call index `step` (0-based):
    0.0 during the copy phase (step <= update_after_step), then the
    ema-pytorch ramp clamped to [min_value, beta]."""
    epoch = jnp.clip(step - update_after_step - 1, 0).astype(jnp.float32)
    ramp = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    decay = jnp.where(epoch <= 0, 0.0, jnp.clip(ramp, min_value, beta))
    copy_phase = step <= update_after_step
    return jnp.where(copy_phase, 0.0, decay)


def _lerp(ema_params, online_params, decay):
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        online_params,
    )


def ema_update(
    state: EmaState,
    online_params,
    *,
    update_every: int = 20,
    **decay_kwargs,
) -> EmaState:
    """Branch-free in-jit update: skipped calls keep the EMA unchanged
    (== lerp with decay 1). Lives inside the jitted train step when
    ema_in_step=True (train/state.py)."""
    step = state.step
    apply = (step % update_every) == 0
    decay = jnp.where(apply, ema_decay(step, **decay_kwargs), 1.0)
    return EmaState(
        params=_lerp(state.params, online_params, decay), step=step + 1
    )


def ema_apply(ema_params, online_params, step, **decay_kwargs):
    """One APPLYING update at call index `step` — the update_every gate has
    already been decided on the host (HostEma). Returns the new EMA params."""
    return _lerp(ema_params, online_params, ema_decay(step, **decay_kwargs))


class HostEma:
    """Host-side update_every scheduler around a jitted `ema_apply`.

    The reference skips 19 of 20 EMA updates in Python
    (`models/trainer_diffusion.py:191` -> ema-pytorch update_every=20);
    the fused in-jit lerp pays a full 21M-param EMA-tree read+write every
    step instead (~22 ms/step at crop 512, ~8% of the step —
    round-3 verdict Weak #4). Here the train step only bumps ema.step
    (ema_in_step=False) and the host runs one small donated jit on the
    applying calls. The call counter mirrors ema.step: sync it from the
    device once per train() entry (`reset`), then count locally — no
    per-step host<->device sync.
    """

    def __init__(self, update_every: int = 20, **decay_kwargs):
        self.update_every = update_every
        self._calls = 0
        self._apply = jax.jit(
            functools.partial(ema_apply, **decay_kwargs), donate_argnums=(0,)
        )

    def reset(self, calls: int) -> None:
        """Sync the host counter to the device ema.step (resume support)."""
        self._calls = int(calls)

    def maybe_apply(self, state):
        """Call once per train step, AFTER the step (mirrors the reference's
        post-optimizer ema.update()). Returns the (possibly) updated
        TrainState. The train step already bumped ema.step, so the call
        index of this update is ema.step - 1 == the host counter."""
        calls = self._calls
        self._calls = calls + 1
        if state.ema is None or calls % self.update_every != 0:
            return state
        new_params = self._apply(
            state.ema.params, state.params, state.ema.step - 1
        )
        return state.replace(ema=state.ema.replace(params=new_params))
