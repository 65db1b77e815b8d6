"""Stage-1 trainer: the conditional noise-diffusion model.

Parity target: reference `models/trainer_diffusion.py` (Trainer :33-364).
Same lifecycle — dataset by name, network by --net_name, EMA(beta .995,
update_after_step 500, update_every 20), GaussianDiffusion(crop_size, T,
schedule, objective), Adam + per-epoch cosine LR, epoch loop with rank-0
logging/snapshots — re-expressed TPU-native:

  * one jitted train step (gradients + Adam + EMA fused, batch sharded over
    the data mesh axis; the DDP all-reduce is implicit in jit partitioning);
  * host loop only feeds sharded batches and sets the per-epoch LR;
  * .test() is the bulk-generation job (trainer_diffusion.py:240-325): the
    reference's 1000-step Python sampling loop becomes one jitted lax.scan
    per batch, and npy export runs on a background writer thread so disk IO
    overlaps device compute. Export keeps the reference's CHW .npy layout
    and 'clean+noisy+x_y.npy' naming (the stage-2 dataset contract).
"""
from __future__ import annotations

import logging
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import data_axis_size, paths_from_args
from ..data.datasets import DATASETS
from ..data.loader import DataLoader, create_dataloader
from ..diffusion import GaussianDiffusion
from ..models import define_network
from ..ops.schedules import make_schedule
from ..parallel import make_mesh, put_replicated, replicated, shard_batch
from ..parallel import activate as mesh_activate
from ..utils.logging import ScalarLogger
from ..utils.profiling import StepTimer
from . import checkpoint as ckpt
from .schedules import cosine_epoch_lr
from .ema import HostEma
from .state import (
    create_train_state,
    make_diffusion_train_step,
    make_optimizer,
    set_learning_rate,
)
from .torch_import import import_torch_params


def _param_count(params) -> float:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)) / 1e6


class Trainer:
    def __init__(self, args):
        if args.phase == "train" and os.environ.get("NOISEDIFF_INT8") == "1":
            raise RuntimeError(
                "NOISEDIFF_INT8 is inference-only (round/clip has zero "
                "gradient a.e.); unset it to train."
            )
        self.args = args
        self.paths = paths_from_args(args)
        self.rank = getattr(args, "rank", -1)
        seed = getattr(args, "random_seed", 0)
        self.rng = jax.random.PRNGKey(seed)

        mixed = getattr(args, "mixed_precision", True)
        self.compute_dtype = jnp.bfloat16 if mixed else None

        ## datasets / loaders (dataset picked by name, like the reference's
        ## importlib plugin system — models/trainer_diffusion.py:42)
        if args.phase == "train":
            ds_cls = DATASETS[args.trainset]
            self.train_dataset = ds_cls(self.paths, args.crop_size, seed=seed)
            self.train_dataloader = create_dataloader(
                self.train_dataset,
                phase="train",
                batch_size=args.batch_size,
                num_workers=args.num_workers,
                dist=getattr(args, "dist", False),
                world_size=getattr(args, "world_size", 1),
                rank=max(self.rank, 0),
                seed=seed,
            )
        else:
            ds_cls = DATASETS[args.testset]
            kwargs = {}
            if args.testset == "NoiseImageGenerationDataset":
                kwargs = dict(iso_value=args.iso_value, ratio_value=args.ratio_value)
            self.test_dataset = ds_cls(self.paths, args.crop_size, seed=seed, **kwargs)
            sampler = None
            if getattr(args, "dist", False):
                # multi-host generation: each process writes a disjoint
                # strided shard of the patch grid
                from ..data.sampler import StridedShardSampler

                sampler = StridedShardSampler(
                    len(self.test_dataset), args.world_size, max(self.rank, 0)
                )
            self.test_dataloader = DataLoader(
                self.test_dataset,
                batch_size=args.batch_size,
                shuffle=False,
                num_workers=args.num_workers,
                sampler=sampler,
            )

        ## network + diffusion core
        self.model = define_network(args.net_name, args, dtype=self.compute_dtype)
        self.params = self._init_params(args)

        def apply_fn(params, x, t, condition):
            return self.model.apply({"params": params}, x, t, condition)

        self.diffusion = GaussianDiffusion(
            apply_fn=apply_fn,
            schedule=make_schedule(args.beta_schedule, args.diffusion_steps),
            image_size=args.crop_size,
            objective=args.diffusion_objective,
            auto_normalize=getattr(args, "auto_normalize", False),
            sampling_timesteps=getattr(args, "sampling_timesteps", None),
        )

        ## mesh: 1-D data axis. Single process: over local devices. Multi
        ## process: over ALL global devices — shard_batch assembles each
        ## process's local loader shard into the global batch (the
        ## DistIterSampler/DDP decomposition, SURVEY §2.7)
        if getattr(args, "dist", False) and jax.process_count() > 1:
            gdev = jax.device_count()
            if args.batch_size % gdev != 0:
                raise ValueError(
                    f"distributed run: global batch_size {args.batch_size} "
                    f"must divide across {gdev} devices"
                )
            self.mesh = make_mesh({"data": gdev})
        else:
            ndev = jax.local_device_count()
            dp = data_axis_size(args.batch_size, ndev)
            self.mesh = make_mesh({"data": dp}, devices=jax.devices()[:dp])
            if dp < ndev and self.rank <= 0:
                logging.warning(
                    "batch_size %d not divisible by %d devices; using %d-way data parallel",
                    args.batch_size, ndev, dp,
                )

        # v5e conv-emitter sweet spot: per-chip batch 8 sustains 1.75x the
        # samples/s of the reference-default bs=4 at crop 512 (measured,
        # BENCH_r02 diffusion_train_samples_per_sec_bs8 21.52 vs 12.13).
        # Default stays reference-compatible (script.sh:4); warn so nobody
        # trains at ~57% of the chip silently.
        per_chip = args.batch_size // max(self.mesh.shape.get("data", 1), 1)
        if (
            args.phase == "train"
            and per_chip < 8
            and jax.devices()[0].platform == "tpu"
            and self.rank <= 0
        ):
            logging.warning(
                "per-chip batch %d < 8: TPU conv emitters reach ~1.75x "
                "samples/s at per-chip batch 8 (crop 512, measured in "
                "BENCH_r02); consider --batch_size %d",
                per_chip, 8 * self.mesh.shape.get("data", 1),
            )

        self._auto_resume = ("", None)
        if args.resume == "auto":
            # crash recovery: resume from the newest snapshot (the reference
            # only supports manual --resume paths — SURVEY.md §5)
            snap = getattr(args, "snapshot_save_dir", "")
            tag = ckpt.latest_epoch(snap) if snap else None
            if tag is not None:
                self.load_networks("net", os.path.join(snap, f"net_{tag}"))
                self._auto_resume = (snap, tag)
                if tag.isdigit() and args.phase == "train":
                    args.start_iter = max(args.start_iter, int(tag) + 1)
                if self.rank <= 0:
                    logging.info("auto-resumed from net_%s", tag)
            elif self.rank <= 0:
                logging.info("auto-resume: no snapshot found, starting fresh")
        elif args.resume and args.resume != ".":
            # "." is the reference test CLI's *default* (test_diffusion.py:73),
            # not a checkpoint path — the reference only works because
            # script.sh always passes an explicit --resume. Normalised here so
            # generation without --resume runs from the initialised params
            # instead of trying to orbax-restore the CWD.
            self.load_networks("net", args.resume)

        if self.rank <= 0:
            logging.info("generator parameters: %f", _param_count(self.params))

        if args.phase == "train":
            self.optimizer = make_optimizer(getattr(args, "weight_decay", 0.0))
            params = put_replicated(self.mesh, self.params)
            # commit the WHOLE state (incl. step counters and optimizer
            # scalars) to the mesh: uncommitted leaves give the first train
            # step a different jit signature than later steps, costing a
            # full recompile (~70s) at step 1
            self.state = put_replicated(
                self.mesh,
                create_train_state(params, self.optimizer, with_ema=True),
            )
            # host-scheduled EMA (the reference's own update_every=20 gating,
            # trainer_diffusion.py:191): the jitted step skips the full-tree
            # EMA lerp 19/20 steps pay nothing for (~22 ms/step at crop 512)
            self.ema_host = HostEma()
            self.train_step = make_diffusion_train_step(
                self.diffusion,
                self.optimizer,
                generation_result=getattr(args, "generation_result", "noise"),
                ema_in_step=False,
            )
            self._restore_train_state()
            if getattr(args, "resume_optim", ""):
                self._apply_opt_component(self._load_opt(args.resume_optim))

        self._sample_fn_cache = {}

    # ------------------------------------------------------------------
    def _opt_component(self):
        """The 'optimizer_G' snapshot payload: Adam moments + step counters.

        The reference saves optimizer_G as a bare state_dict
        (trainer_diffusion.py:352-364, load at :333-349); here the component
        also carries the train and EMA step counters so a resumed run
        reproduces the uninterrupted one (EMA warmup/ramp depends on step)."""
        payload = {"opt_state": self.state.opt_state, "step": self.state.step}
        if self.state.ema is not None:
            payload["ema_step"] = self.state.ema.step
        return payload

    def _load_opt(self, path):
        """Tolerant optimizer-snapshot restore: current {'opt_state','step'
        [,'ema_step']} payload, or a legacy bare opt_state tree (round-1
        save_networks) — a strict restore would crash the resume flow."""
        try:
            return ckpt.load_component(path, like=self._opt_component())
        except Exception:
            opt_state, step = ckpt.load_opt_component(
                path, self.state.opt_state, self.state.step
            )
            out = {"opt_state": opt_state}
            if step is not None:
                out["step"] = step
            return out

    def _apply_opt_component(self, restored):
        put = lambda t: put_replicated(self.mesh, t)
        ema = self.state.ema
        if ema is not None and "ema_step" in restored:
            ema = ema.replace(step=put(restored["ema_step"]))
        self.state = self.state.replace(
            opt_state=put(restored["opt_state"]),
            step=(
                put(restored["step"]) if "step" in restored else self.state.step
            ),
            ema=ema,
        )

    def _restore_train_state(self):
        """Auto-resume restores EMA params and optimizer/step state alongside
        the net params (round-1 gap: only net was restored, silently
        reinitialising the shipped EMA artefact and Adam moments)."""
        snap, tag = self._auto_resume
        if tag is None:
            return
        ema_path = os.path.join(snap, f"ema_{tag}")
        if self.state.ema is not None and ckpt.component_exists(ema_path):
            ema_params = ckpt.load_component(ema_path, like=self.state.ema.params)
            self.state = self.state.replace(
                ema=self.state.ema.replace(
                    params=put_replicated(self.mesh, ema_params)
                )
            )
        opt_path = os.path.join(snap, f"optimizer_G_{tag}")
        if ckpt.component_exists(opt_path):
            self._apply_opt_component(self._load_opt(opt_path))
            if self.rank <= 0:
                logging.info(
                    "auto-resumed ema/optimizer state from %s (step %d)",
                    opt_path, int(self.state.step),
                )

    # ------------------------------------------------------------------
    def _init_params(self, args):
        rng = jax.random.fold_in(self.rng, 123)
        s = args.crop_size
        x = jnp.zeros((1, s, s, 4), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        cond = {
            "clean_img": jnp.zeros((1, s, s, 4), jnp.float32),
            "position": jnp.zeros((1, s, s, 2), jnp.float32),
            "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
        }
        return jax.jit(self.model.init)(rng, x, t, cond)["params"]

    def _prepare(self, batch):
        """Host batch -> device, NHWC, sharded over the data axis (replaces
        prepare()'s .to(device) — trainer_diffusion.py:133-138, including the
        condition tensors the reference leaves to DataParallel scatter)."""
        device_batch = {}
        for key in ("noise", "noisy_img", "clean_img", "coord"):
            if key in batch:
                device_batch[key] = batch[key]
        if "iso_ratio_idx" in batch:
            device_batch["iso_ratio_idx"] = batch["iso_ratio_idx"]
        return shard_batch(self.mesh, device_batch)

    # ------------------------------------------------------------------
    def train(self):
        args = self.args
        if self.rank <= 0:
            logging.info("training on %s", args.trainset)
            logging.info("%d training samples", len(self.train_dataset))
            logging.info("the init lr: %f", args.lr)

        tb = None
        if getattr(args, "use_tb_logger", False) and self.rank <= 0:
            tb = ScalarLogger(args.save_folder.replace("weights", "tb_logger"))

        steps = 0
        timer = StepTimer()
        rng_train = jax.random.fold_in(self.rng, 1)
        # sync the host EMA call counter to the device counter ONCE (resume
        # restores ema.step via the optimizer_G component)
        if self.state.ema is not None:
            self.ema_host.reset(int(self.state.ema.step))

        for epoch in range(args.start_iter, args.max_iter):
            lr = cosine_epoch_lr(args.lr, args.max_iter, epoch)
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )
            logging.info("current_lr: %f", lr)
            self.train_dataloader.set_epoch(epoch)

            for j, batch in enumerate(self.train_dataloader):
                # jax.profiler trace of steps 5-9 of the first epoch
                # (--profile; the reference has no profiling story, SURVEY §5)
                if getattr(args, "profile", False) and epoch == args.start_iter:
                    if j == 5:
                        jax.profiler.start_trace(
                            os.path.join(args.save_folder, "profile")
                        )
                    elif j == 10:
                        jax.profiler.stop_trace()

                device_batch = self._prepare(batch)
                # activate(mesh): trace-time mesh visibility for the GN
                # kernels' SPMD partition rules (parallel.mesh.activate)
                with mesh_activate(self.mesh):
                    self.state, metrics = self.train_step(
                        self.state, device_batch, rng_train
                    )
                self.state = self.ema_host.maybe_apply(self.state)
                timer.tick()

                if j % args.log_freq == 0:
                    loss = float(metrics["diffusion_loss"])
                    if self.rank <= 0:
                        logging.info(
                            "epoch:%03d step:%04d  diffusion_loss:%.06f "
                            "loss_sum:%f %4.6fs/batch",
                            epoch, j, loss, loss, timer.rate_and_reset(),
                        )
                if tb is not None and steps % args.vis_step_freq == 0:
                    tb.add_scalar(
                        "diffusion_loss", float(metrics["diffusion_loss"]), steps
                    )
                    tb.add_scalar("lr", lr, steps)
                steps += 1

            if epoch % args.save_epoch_freq == 0 and self.rank <= 0:
                logging.info("Saving state, epoch: %d iter:0", epoch)
                self.save_networks("net", epoch)
                self.save_networks("ema", epoch)
                self.save_networks("optimizer_G", epoch)

        if self.rank <= 0:
            if tb is not None:
                tb.close()
            self.save_networks("net", "final")
            self.save_networks("ema", "final")
            logging.info("The training stage is over!!!")

    # ------------------------------------------------------------------
    def _sample_jit(self, batch_size: int):
        """Cache one compiled sampler per batch size."""
        if batch_size not in self._sample_fn_cache:
            gd = self.diffusion
            shape = (batch_size, self.args.crop_size, self.args.crop_size, 4)
            sampler = getattr(self.args, "sampler", "auto")
            # keep the scan carry in the model's folded layout when the
            # model lane-folds (see gaussian.model_predictions io_fold)
            fold_io = (
                self.model.effective_fold(self.args.crop_size)
                if hasattr(self.model, "effective_fold")
                else 1
            )

            # fused heads+DDIM-update tail (ops/pallas/ddim_head.py),
            # exact-parity-tested vs the plain scan (tests/test_ddim_head.py).
            # Measured NEUTRAL-to-slower on the v5e (plain 19.5 / xla 19.7 /
            # pallas 21.2 ms per eval, BENCH_NOTES.md) — XLA already fuses
            # the plain tail to near-roofline — so it stays opt-in:
            # NOISEDIFF_FUSED_TAIL=xla|pallas.
            tail_flag = os.environ.get("NOISEDIFF_FUSED_TAIL", "")
            trunk_fn = None
            if (
                tail_flag in ("xla", "pallas", "1")
                and gd.objective == "pred_v"
                and getattr(self.model, "trunk_only", None) is False
            ):
                trunk = self.model.clone(trunk_only=True)

                def trunk_fn(params, x, t, condition):
                    return trunk.apply({"params": params}, x, t, condition)

            # fallback matches the CLI default (the certified production
            # grid) so args namespaces predating the flag get the same
            # sampler the CLI ships
            dpm_spacing = getattr(self.args, "dpm_spacing", "lambda")

            def fn(params, rng, condition):
                if sampler == "dpm":
                    return gd.dpm_solver_sample(params, rng, shape, condition,
                                                fold_io=fold_io,
                                                step_spacing=dpm_spacing)
                if sampler == "ddim" or (sampler == "auto" and gd.is_ddim_sampling):
                    return gd.ddim_sample(
                        params, rng, shape, condition, fold_io=fold_io,
                        trunk_apply_fn=trunk_fn,
                        fused_mode="pallas" if tail_flag == "pallas" else "xla",
                    )
                return gd.p_sample_loop(params, rng, shape, condition,
                                        fold_io=fold_io)

            self._sample_fn_cache[batch_size] = jax.jit(fn)
        return self._sample_fn_cache[batch_size]

    def test(self):
        """Bulk noise generation with npy export (trainer_diffusion.py:240-325).

        --skip_existing (TPU-native extension; the reference restarts bulk
        generation from scratch after a crash): batches whose npy outputs
        are all already on disk are skipped without touching the device.
        Output names are deterministic functions of the (rank-local) grid
        walk, and the per-batch PRNG is fold_in(rng, batch_index), so a
        resumed run regenerates any missing batch bit-identically to an
        uninterrupted one — preemption-safe generation on shared TPU pools
        (SURVEY §5 failure recovery)."""
        args = self.args
        save_path = args.save_folder
        npy_path = os.path.join(save_path, "npy")
        out_dir = os.path.join(npy_path, "generated")
        os.makedirs(out_dir, exist_ok=True)

        # background npy writer: disk IO overlaps the next batch's scan
        write_q: "queue.Queue" = queue.Queue(maxsize=64)

        def writer():
            while True:
                item = write_q.get()
                if item is None:
                    return
                name, arr = item
                # write-to-temp + rename so a preemption mid-write can never
                # leave a truncated .npy that --skip_existing would trust
                dst = os.path.join(out_dir, name)
                tmp = dst + ".tmp.npy"  # .npy suffix stops np.save renaming it
                np.save(tmp, arr)
                os.replace(tmp, dst)

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        sample_fn = self._sample_jit(args.batch_size)
        params = self.params
        rng = jax.random.fold_in(self.rng, 999)
        npy_num = 0
        n_skipped = 0
        t0 = time.time()

        for bidx, batch in enumerate(self.test_dataloader):
            n = batch["coord"].shape[0]
            bs = args.batch_size

            # output names are a pure function of the grid walk — compute
            # them up front so --skip_existing can elide the device call
            names = []
            if getattr(args, "save_npy", False):
                for i in range(n):
                    image_coord = batch["image_coord"][i]
                    if not getattr(args, "dark_frame", False):
                        clean_name = batch["clean_name"][i].split(".ARW")[0].split(".npy")[0]
                        noisy_name = batch.get("noisy_name", batch["clean_name"])[i]
                        noisy_name = noisy_name.split(".ARW")[0].split(".npy")[0]
                        names.append(f"{clean_name}+{noisy_name}+{image_coord}.npy")
                    else:
                        iso_i = int(batch["iso"][i])
                        ratio_i = int(batch["ratio"][i])
                        names.append(
                            f"{npy_num + i:05d}_{iso_i}_{ratio_i}+{image_coord}.npy"
                        )
            if (
                names
                and getattr(args, "skip_existing", False)
                and all(os.path.exists(os.path.join(out_dir, nm)) for nm in names)
            ):
                npy_num += n
                n_skipped += n
                continue

            def pad(x):
                if x.shape[0] == bs:
                    return x
                reps = [x[-1:]] * (bs - x.shape[0])
                return np.concatenate([x] + reps, axis=0)

            coord = pad(batch["coord"])
            if getattr(args, "dark_frame", False) or "clean_img" not in batch:
                clean = np.zeros(coord.shape[:3] + (4,), np.float32)
            else:
                clean = pad(batch["clean_img"])
            iso_ratio_idx = pad(batch["iso_ratio_idx"])

            condition = {
                "clean_img": jnp.asarray(clean),
                "iso_ratio_idx": jnp.asarray(iso_ratio_idx),
                "position": jnp.asarray(coord)
                if getattr(args, "positional_encoding", True)
                else jnp.zeros_like(jnp.asarray(coord)),
            }
            # NOT mesh_activate-wrapped: generation inputs are rank-local
            # (each rank samples its own grid shard) and the GN kernels are
            # train-trace-only anyway — activating the global mesh here
            # would force rank-local uncommitted arrays onto a mesh with
            # non-addressable devices under --dist
            rng_b = jax.random.fold_in(rng, bidx)
            output = sample_fn(params, rng_b, condition)
            output = np.asarray(output[:n])  # drop padding

            for i, save_name in enumerate(names):
                # reference-compatible CHW layout (trainer_diffusion.py:317)
                write_q.put((save_name, output[i].transpose(2, 0, 1)))
            npy_num += len(names)

        write_q.put(None)
        wt.join()
        if self.rank <= 0:
            logging.info(
                "generated %d patches in %.1fs (%d already on disk, skipped)",
                npy_num - n_skipped, time.time() - t0, n_skipped,
            )

    # ------------------------------------------------------------------
    def save_networks(self, net_name: str, epoch):
        snapshot_dir = getattr(
            self.args, "snapshot_save_dir", os.path.join(self.args.save_folder, "snapshot")
        )
        os.makedirs(snapshot_dir, exist_ok=True)
        if net_name == "net":
            tree = self.state.params if hasattr(self, "state") else self.params
        elif net_name == "ema":
            # like the reference, the EMA snapshot stores the averaged model
            # itself (trainer_diffusion.py:354-355)
            tree = self.state.ema.params
        elif net_name == "optimizer_G":
            tree = self._opt_component()
        else:
            raise ValueError(net_name)
        ckpt.save_component(snapshot_dir, net_name, epoch, tree)

    def load_networks(self, net_name: str, resume: str, strict: bool = True):
        if resume.endswith(".pth") or resume.endswith(".pt"):
            sd = ckpt.load_component(resume)
            self.params = import_torch_params(
                jax.tree.map(np.asarray, self.params), sd, strict=strict
            )
        else:
            self.params = ckpt.load_component(resume, like=self.params)
        if hasattr(self, "state"):
            self.state = self.state.replace(
                params=put_replicated(self.mesh, self.params)
            )
