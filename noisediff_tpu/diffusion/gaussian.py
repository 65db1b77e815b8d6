"""Gaussian diffusion core: training loss and scan-compiled samplers.

Behavioural parity target: reference `models/denoising_diffusion_pytorch.py`
(GaussianDiffusion :167-542). Differences are deliberate TPU-native design:

  * The reference's 1000-iteration Python sampling loop (:394, the
    throughput-critical path per SURVEY.md §3.2) becomes a `jax.lax.scan`
    body inside one jit — one compilation, zero host round-trips, buffers
    donated across steps.
  * Data-dependent branches in the samplers (the t>0 noise gate :371 and the
    DDIM time_next<0 terminal step :422-425) are folded into branch-free
    `jnp.where` arithmetic: setting alpha_next=1 for the terminal DDIM pair
    makes the general update reduce exactly to x = x_start.
  * Stochastic parity with torch RNG is impossible by construction; parity is
    defined distribution-level (tests check sampler moments and the exact
    deterministic subgraph: schedule math, conversions, posterior).

Everything here is functional: the model enters as `apply_fn(params, x, t,
condition)`, PRNG keys are explicit, and all methods are jit/scan friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import DiffusionSchedule, make_schedule

Condition = Optional[Dict[str, jnp.ndarray]]

OBJECTIVES = ("pred_noise", "pred_x0", "pred_v")


def _scan_unroll() -> int:
    """NOISEDIFF_SCAN_UNROLL=n unrolls the sampler scans n steps per XLA
    while-iteration (default 1). Read at trace time like the other env
    gates; numerically identity — only the loop-body replication changes."""
    import os

    try:
        return max(1, int(os.environ.get("NOISEDIFF_SCAN_UNROLL", "1")))
    except ValueError:
        return 1


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim tensor.

    Equivalent to reference `extract` (:91-94) for NHWC tensors.
    """
    out = a[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def _dpm_step_grid(alphas_cumprod, steps: int, spacing: str):
    """Descending DPM-Solver knot list `[T-1, ..., -1]` for a discrete
    schedule (host-side; consumed at trace time).

    spacing='time': DDIM's uniform-in-t linspace grid (reference :409-411),
    kept verbatim for step-count comparability — including its duplicate
    knots when steps approaches T (the reference's own behaviour).

    spacing='lambda': uniform in half-log-SNR lambda(t); interior knots land
    on the discrete t nearest each lambda target, forced strictly
    decreasing. A knot that would collide at the t=0 floor is DROPPED
    rather than duplicated — a duplicate pair has h == 0, i.e. a
    full-cost model eval that returns x unchanged — so the returned grid
    may have fewer than steps+1 knots when steps approaches T.
    """
    ac = np.asarray(alphas_cumprod, np.float64)
    total = len(ac)
    if steps < 1:
        raise ValueError(f"need at least one step, got {steps}")
    if spacing == "lambda":
        lam_all = 0.5 * np.log(ac / np.maximum(1.0 - ac, 1e-300))
        targets = np.linspace(lam_all[total - 1], lam_all[0], steps + 1)
        times = [total - 1]
        for tg in targets[1:-1]:
            tk = int(np.argmin(np.abs(lam_all - tg)))
            tk = max(min(tk, times[-1] - 1), 0)
            if tk < times[-1]:
                times.append(tk)
        times.append(-1)
    elif spacing == "time":
        times = np.linspace(-1, total - 1, steps + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
    else:
        raise ValueError(
            f"step_spacing must be 'time' or 'lambda', got {spacing!r}"
        )
    return times


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Conditional DDPM with pred_noise / pred_x0 / pred_v parameterisations.

    Args mirror the reference ctor (:168-182). `apply_fn` is the denoiser
    network: (params, x, t, condition) -> model_out, NHWC.
    """

    apply_fn: Callable[..., jnp.ndarray]
    schedule: DiffusionSchedule
    image_size: int
    channels: int = 4
    objective: str = "pred_v"
    sampling_timesteps: Optional[int] = None  # None -> full-T DDPM (reference default)
    ddim_sampling_eta: float = 0.0
    auto_normalize: bool = False  # off in all shipped configs (:179)
    sample_dtype: Any = jnp.float32

    def __post_init__(self):
        if self.objective not in OBJECTIVES:
            raise ValueError(f"objective must be one of {OBJECTIVES}")
        if self.sampling_timesteps is not None:
            assert self.sampling_timesteps <= self.schedule.num_timesteps

    # -- construction helper ------------------------------------------------
    @classmethod
    def create(
        cls,
        apply_fn,
        *,
        image_size: int,
        timesteps: int = 1000,
        beta_schedule: str = "sigmoid",
        objective: str = "pred_v",
        sampling_timesteps: Optional[int] = None,
        ddim_sampling_eta: float = 0.0,
        auto_normalize: bool = False,
        channels: int = 4,
    ) -> "GaussianDiffusion":
        return cls(
            apply_fn=apply_fn,
            schedule=make_schedule(beta_schedule, timesteps),
            image_size=image_size,
            channels=channels,
            objective=objective,
            sampling_timesteps=sampling_timesteps,
            ddim_sampling_eta=ddim_sampling_eta,
            auto_normalize=auto_normalize,
        )

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    @property
    def is_ddim_sampling(self) -> bool:
        # reference :235 — DDIM only when strictly fewer sampling steps
        return (
            self.sampling_timesteps is not None
            and self.sampling_timesteps < self.num_timesteps
        )

    # -- normalisation (identity in shipped configs, :290-291) --------------
    def normalize(self, x):
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x):
        return (x + 1.0) * 0.5 if self.auto_normalize else x

    # -- x0 / eps / v conversions (:298-320) ---------------------------------
    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _extract(s.posterior_variance, t, x_t.ndim)
        log_variance = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    # -- model wrappers ------------------------------------------------------
    def model_predictions(
        self, params, x, t, condition: Condition = None,
        clip_x_start: bool = False, rederive_pred_noise: bool = False,
        io_fold: int = 1,
    ):
        """(pred_noise, pred_x_start) per reference :331-354.

        io_fold > 1: x is WIDTH-FOLDED (blocks.fold_width) and the returned
        tensors stay folded. The model is called on the unfolded view; for a
        lane-folded model the unfold here cancels structurally against the
        model's internal fold, so the sampler carry never pays the per-step
        fold/unfold relayouts (every conversion below is elementwise, so the
        carry domain is free to choose).
        """
        if io_fold > 1:
            from ..models.blocks import fold_width, unfold_width

            model_output = self.apply_fn(
                params, unfold_width(x, io_fold), t, condition
            )
            model_output = fold_width(model_output, io_fold).astype(jnp.float32)
        else:
            model_output = self.apply_fn(params, x, t, condition).astype(jnp.float32)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return pred_noise, x_start

    # -- training loss (:473-542) --------------------------------------------
    def p_losses(self, params, rng, x_start, t, condition: Condition = None):
        rng_noise = jax.random.fold_in(rng, 1)
        noise = jax.random.normal(rng_noise, x_start.shape, jnp.float32)
        x = self.q_sample(x_start, t, noise)
        model_out = self.apply_fn(params, x, t, condition).astype(jnp.float32)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        loss = jnp.square(model_out - target)
        loss = loss.mean(axis=tuple(range(1, loss.ndim)))  # per-sample mean
        loss = loss * self.schedule.loss_weight(self.objective)[t]

        if self.objective == "pred_x0":
            # extra intensity-matching term, reference :524-528 (per-channel
            # spatial means, L1)
            li = jnp.abs(
                model_out.mean(axis=(1, 2)) - target.mean(axis=(1, 2))
            ).mean()
            return loss.mean() + li
        return loss.mean()

    def loss(self, params, rng, img, condition: Condition = None):
        """Training objective (reference forward :534-542): sample t, normalise."""
        b = img.shape[0]
        assert img.shape[1] == self.image_size and img.shape[2] == self.image_size, (
            f"height/width of image must be {self.image_size}, got {img.shape[1:3]}"
        )
        rng_t = jax.random.fold_in(rng, 0)
        t = jax.random.randint(rng_t, (b,), 0, self.num_timesteps)
        img = self.normalize(img)
        return self.p_losses(params, rng, img, t, condition)

    # -- DDPM ancestral sampler (:366-402) ------------------------------------
    @staticmethod
    def _fold_shape(shape, fold):
        b, h, w, c = shape
        assert w % fold == 0, f"fold_io={fold} does not divide width {w}"
        return (b, h, w // fold, c * fold)

    def p_sample_loop(
        self, params, rng, shape, condition: Condition = None,
        init_noise: Optional[jnp.ndarray] = None, fold_io: int = 1,
    ):
        """Full-T ancestral sampling as a lax.scan. Returns the final sample.

        `init_noise` overrides x_T (the reference's preset_mean hook :383-389).
        `fold_io` > 1 keeps the scan carry width-folded (see
        model_predictions); the noise draws happen in the folded shape —
        distributionally identical, the documented stochastic-parity contract.
        """
        s = self.schedule
        fshape = self._fold_shape(shape, fold_io) if fold_io > 1 else shape
        rng_init, rng_steps = jax.random.split(rng)
        if init_noise is None:
            x = jax.random.normal(rng_init, fshape, self.sample_dtype)
        else:
            x = init_noise.astype(self.sample_dtype)
            if fold_io > 1:
                from ..models.blocks import fold_width

                x = fold_width(x, fold_io)

        def step(x, t):
            tb = jnp.full((shape[0],), t, jnp.int32)
            _, x_start = self.model_predictions(
                params, x, tb, condition, io_fold=fold_io
            )
            x_start = jnp.clip(x_start, -1.0, 1.0)  # clip_denoised=True (:370)
            mean, _, log_var = self.q_posterior(x_start, x, tb)
            noise = jax.random.normal(
                jax.random.fold_in(rng_steps, t), fshape, self.sample_dtype
            )
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))  # :371
            x = mean + jnp.exp(0.5 * log_var) * noise
            return x.astype(self.sample_dtype), None

        ts = jnp.arange(s.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x, ts)
        if fold_io > 1:
            from ..models.blocks import unfold_width

            x = unfold_width(x, fold_io)
        return self.unnormalize(x)

    # -- DDIM sampler (:404-444) ----------------------------------------------
    def ddim_sample(
        self, params, rng, shape, condition: Condition = None,
        sampling_timesteps: Optional[int] = None, eta: Optional[float] = None,
        init_noise: Optional[jnp.ndarray] = None, fold_io: int = 1,
        trunk_apply_fn=None, fused_interpret: bool = False,
        fused_mode: str = "xla",
    ):
        total = self.num_timesteps
        steps = sampling_timesteps or self.sampling_timesteps or total
        eta = self.ddim_sampling_eta if eta is None else eta

        # reference time grid (:409-411): linspace(-1, T-1, S+1), int, reversed pairs
        times = np.linspace(-1, total - 1, steps + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
        time_pairs = np.array(list(zip(times[:-1], times[1:])), np.int32)  # (S, 2)

        ac = self.schedule.alphas_cumprod
        t_cur = jnp.asarray(time_pairs[:, 0])
        t_next = jnp.asarray(time_pairs[:, 1])
        alpha = ac[t_cur]
        # terminal step: alpha_next=1 makes the update reduce to x = x_start
        alpha_next = jnp.where(t_next < 0, 1.0, ac[jnp.maximum(t_next, 0)])
        sigma = eta * jnp.sqrt(
            jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
        )
        c = jnp.sqrt(jnp.maximum(1.0 - alpha_next - sigma ** 2, 0.0))

        fshape = self._fold_shape(shape, fold_io) if fold_io > 1 else shape
        rng_init, rng_steps = jax.random.split(rng)
        if init_noise is None:
            x = jax.random.normal(rng_init, fshape, self.sample_dtype)
        else:
            x = init_noise.astype(self.sample_dtype)
            if fold_io > 1:
                from ..models.blocks import fold_width

                x = fold_width(x, fold_io)

        idx = jnp.arange(len(time_pairs))
        if trunk_apply_fn is not None:
            # fused tail: heads + clip/rederive + DDIM update in one Pallas
            # pass (ops/pallas/ddim_head.py). Only the pred_v objective's
            # clip+rederive formulation is baked into the kernel — exactly
            # what this sampler uses (model_predictions above).
            if self.objective != "pred_v":
                raise ValueError(
                    "fused DDIM tail implements the pred_v objective only"
                )
            from ..ops.pallas.ddim_head import (
                ddim_step_scalars,
                fused_ddim_head_update,
                reference_ddim_head_update,
            )

            scal = ddim_step_scalars(alpha, alpha_next, sigma, c)  # (S, 8)

            def fstep(x, inputs):
                i, t, sc = inputs
                tb = jnp.full((shape[0],), t, jnp.int32)
                xin = x
                if fold_io > 1:
                    from ..models.blocks import unfold_width

                    xin = unfold_width(x, fold_io)
                xf, sa, sb, head = trunk_apply_fn(params, xin, tb, condition)
                noise = jax.random.normal(
                    jax.random.fold_in(rng_steps, i), fshape,
                    self.sample_dtype,
                )
                if fused_mode == "xla":
                    # token-matmul head formulation + one fused epilogue; XLA
                    # keeps its full DMA bandwidth (the Pallas kernel's
                    # re-read of the three C-wide maps runs at Mosaic copy
                    # rates, ~1/4 of XLA's — measured slower on the v5e)
                    x = reference_ddim_head_update(
                        xf, sa, sb, x, noise, *head, sc, fold=fold_io,
                    )
                else:
                    x = fused_ddim_head_update(
                        xf, sa, sb, x, noise, *head, sc, fold=fold_io,
                        interpret=fused_interpret,
                    )
                return x, None

            x, _ = jax.lax.scan(fstep, x, (idx, t_cur, scal))
            if fold_io > 1:
                from ..models.blocks import unfold_width

                x = unfold_width(x, fold_io)
            return self.unnormalize(x)

        # eta == 0 (the reference default, denoising_diffusion_pytorch.py:178)
        # zeroes every sigma; sigma is runtime data inside the scan, so XLA
        # cannot DCE the per-step threefry draw — gate it at trace time.
        # Bit-exact: x + 0.0 * noise == x for the finite noise normal() makes.
        deterministic = float(eta) == 0.0

        def step(x, inputs):
            i, t, a_next, sig, cc = inputs
            tb = jnp.full((shape[0],), t, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, x, tb, condition, clip_x_start=True,
                rederive_pred_noise=True, io_fold=fold_io,
            )
            x = x_start * jnp.sqrt(a_next) + cc * pred_noise
            if not deterministic:
                noise = jax.random.normal(
                    jax.random.fold_in(rng_steps, i), fshape, self.sample_dtype
                )
                x = x + sig * noise
            return x.astype(self.sample_dtype), None

        x, _ = jax.lax.scan(
            step, x, (idx, t_cur, alpha_next, sigma, c), unroll=_scan_unroll()
        )
        if fold_io > 1:
            from ..models.blocks import unfold_width

            x = unfold_width(x, fold_io)
        return self.unnormalize(x)

    # -- DPM-Solver++(2M) sampler (framework extension; not in the reference) --
    def dpm_solver_sample(
        self, params, rng, shape, condition: Condition = None,
        sampling_timesteps: Optional[int] = None, fold_io: int = 1,
        init_noise: Optional[jnp.ndarray] = None,
        step_spacing: str = "time",
    ):
        """Second-order multistep DPM-Solver++ (arXiv:2211.01095) in the
        data-prediction formulation. Deterministic (eta=0). Converges in
        ~3-5x fewer steps than DDIM at matched sample quality, multiplying
        bulk-generation throughput on top of the scan/bf16 wins.

        Uses the same model_predictions head (clip_x_start=True like the
        reference's DDIM path), so any trained checkpoint works unchanged.

        step_spacing:
          'time'   — DDIM's uniform-in-t grid (reference :409-411), so step
                     counts are directly comparable with the DDIM sweep.
          'lambda' — uniform in half-log-SNR lambda(t), the DPM-Solver paper's
                     own grid. At low step counts this spends model evals where
                     the ODE actually bends (the low-noise end: with T=1000 the
                     time-uniform 15-step grid's last model eval sits at t~66,
                     the lambda grid's near t~0), which is what lets fewer
                     steps match DDIM quality. KLD-certified vs DDIM-50 from
                     the same trained checkpoint (DPM_STEP_SWEEP.json,
                     2026-08-21): lambda 15->0.24x, 12->0.24x, 10->0.36x,
                     8->0.95x — every one better than both DDIM-50 (1.0) and
                     the previously shipped time-15 grid (0.84x). The
                     production default is (10, 'lambda').
        """
        total = self.num_timesteps
        steps = sampling_timesteps or self.sampling_timesteps
        if steps is None:
            import logging

            # production defaults, KLD-certified at TPU scale against the
            # reference protocol from the same trained checkpoint
            # (DPM_STEP_SWEEP.json, 2026-08-21). Per grid: the lambda grid
            # certifies down to 10 (0.36x of DDIM-50's KLD; 8 is the edge
            # at 0.95x, 6 fails); the time grid's knee is 15 (0.84x;
            # 10 fails at 1.26x).
            steps = 10 if step_spacing == "lambda" else 15
            logging.getLogger("noisediff").warning(
                "dpm_solver_sample: no step count given (neither "
                "sampling_timesteps arg nor schedule default); using the "
                "KLD-certified default %d for the %r grid",
                steps, step_spacing,
            )

        ac = np.asarray(self.schedule.alphas_cumprod, np.float64)
        times = _dpm_step_grid(ac, steps, step_spacing)
        pairs = np.array(list(zip(times[:-1], times[1:])), np.int32)

        def lam(t_idx):  # log-SNR/2 at discrete t, with t=-1 -> clean data
            if t_idx < 0:
                return 60.0  # effectively +inf: sigma -> 0
            a = np.sqrt(ac[t_idx])
            s = np.sqrt(1.0 - ac[t_idx])
            return np.log(a / s)

        t_cur = pairs[:, 0]
        t_next = pairs[:, 1]
        lam_cur = np.array([lam(t) for t in t_cur])
        lam_next = np.array([lam(t) for t in t_next])
        lam_prev = np.concatenate([[lam_cur[0]], lam_cur[:-1]])  # lambda_{i-1}
        h = lam_next - lam_cur
        h_prev = np.maximum(lam_cur - lam_prev, 1e-12)
        r = h_prev / np.maximum(np.abs(h), 1e-12)
        alpha_next = np.sqrt(np.where(t_next < 0, 1.0, ac[np.maximum(t_next, 0)]))
        sigma_next = np.sqrt(np.maximum(1.0 - alpha_next ** 2, 0.0))
        sigma_cur = np.sqrt(1.0 - ac[t_cur])
        phi = np.expm1(-h)

        consts = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, np.float32)),
            (t_cur, alpha_next, sigma_next, sigma_cur, phi, r),
        )

        fshape = self._fold_shape(shape, fold_io) if fold_io > 1 else shape
        rng_init, _ = jax.random.split(rng)
        if init_noise is None:
            x = jax.random.normal(rng_init, fshape, self.sample_dtype)
        else:
            x = init_noise.astype(self.sample_dtype)
            if fold_io > 1:
                from ..models.blocks import fold_width

                x = fold_width(x, fold_io)

        def step(carry, inputs):
            x, x0_prev, first = carry
            i, (t, a_next, s_next, s_cur, ph, rr) = inputs
            tb = jnp.full((shape[0],), t.astype(jnp.int32), jnp.int32)
            _, x0 = self.model_predictions(
                params, x, tb, condition, clip_x_start=True, io_fold=fold_io
            )
            # 2M update: D = (1 + 1/(2r)) x0 - 1/(2r) x0_prev (first step: Euler)
            coef = 1.0 / (2.0 * jnp.maximum(rr, 1e-6))
            d = jnp.where(first, x0, (1.0 + coef) * x0 - coef * x0_prev)
            x_new = (s_next / jnp.maximum(s_cur, 1e-12)) * x - a_next * ph * d
            # terminal step (sigma_next == 0): x -> x0
            x_new = jnp.where(s_next == 0.0, x0, x_new)
            return (x_new.astype(self.sample_dtype), x0, jnp.zeros((), bool)), None

        idx = jnp.arange(len(pairs))
        (x, _, _), _ = jax.lax.scan(
            step,
            (x, jnp.zeros_like(x), jnp.ones((), bool)),
            (idx, consts),
            unroll=_scan_unroll(),
        )
        if fold_io > 1:
            from ..models.blocks import unfold_width

            x = unfold_width(x, fold_io)
        return self.unnormalize(x)

    # -- dispatcher (:446-451) --------------------------------------------------
    def sample(self, params, rng, batch_size: int, condition: Condition = None):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        if self.is_ddim_sampling:
            return self.ddim_sample(params, rng, shape, condition)
        return self.p_sample_loop(params, rng, shape, condition)

    # -- latent interpolation (:453-471) -----------------------------------------
    def interpolate(
        self, params, rng, x1, x2, condition: Condition = None,
        t: Optional[int] = None, lam: float = 0.5,
    ):
        t = self.num_timesteps - 1 if t is None else t
        assert x1.shape == x2.shape
        b = x1.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        k1, k2, rng_steps = jax.random.split(rng, 3)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape, jnp.float32))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape, jnp.float32))
        x = (1 - lam) * xt1 + lam * xt2

        def step(x, i):
            ti = jnp.full((b,), i, jnp.int32)
            _, x_start = self.model_predictions(params, x, ti, condition)
            x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = self.q_posterior(x_start, x, ti)
            noise = jax.random.normal(jax.random.fold_in(rng_steps, i), x.shape)
            noise = jnp.where(i > 0, noise, jnp.zeros_like(noise))
            return mean + jnp.exp(0.5 * log_var) * noise, None

        x, _ = jax.lax.scan(step, x, jnp.arange(t - 1, -1, -1))
        return x
