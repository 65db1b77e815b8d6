"""Stage-2 trainer: the LSID denoiser on synthetic / real / PG data.

Parity target: reference `models/trainer_denoising.py` (Trainer :29-344):
L1/MSE losses, manual LR staircase (/2 at 50%, 1e-5 at 80%), random
horizontal flip, PMN Shot-Noise Augmentation, periodic visualisation dumps,
per-epoch snapshots. TPU-native differences: flip + SNA + loss + Adam run in
one jitted step with the batch sharded over the data mesh axis; SNA is the
batched device implementation (ops/sna.py) instead of the reference's
per-sample host loop (:207-217); vis JPEGs go through PIL.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import data_axis_size, paths_from_args
from ..data.datasets import DATASETS
from ..data.loader import DataLoader, create_dataloader
from ..models import define_network
from ..parallel import make_mesh, put_replicated, replicated, shard_batch
from ..parallel import activate as mesh_activate
from ..utils.logging import ScalarLogger
from ..utils.profiling import StepTimer
from . import checkpoint as ckpt
from .schedules import denoising_staircase_lr
from .state import (
    create_train_state,
    make_denoising_train_step,
    make_optimizer,
    set_learning_rate,
)
from .torch_import import import_torch_params


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

        if args.phase == "train":
            ds_cls = DATASETS[args.trainset]
            kwargs = {}
            if args.trainset in (
                "SyntheticNoisDiffDenoisingDataset",
                "RealSonyDenoisingDataset",
            ):
                kwargs["sub_darkshading"] = getattr(args, "sub_darkshading", False)
            self.train_dataset = ds_cls(self.paths, args.crop_size, seed=seed, **kwargs)
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
            self.test_dataset = ds_cls(self.paths, args.crop_size, seed=seed)
            self.test_dataloader = DataLoader(
                self.test_dataset, batch_size=args.batch_size,
                shuffle=False, num_workers=args.num_workers,
            )

        self.model = define_network(args.net_name, args, dtype=self.compute_dtype)
        self.params = self._init_params(args)

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

        self._auto_resume = ("", None)
        if args.resume == "auto":
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
            # "." = the reference CLIs' no-resume default, not a path
            self.load_networks("net", args.resume)

        if self.rank <= 0:
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params)) / 1e6
            logging.info("----- generator parameters: %f -----", n)

        def apply_fn(params, x):
            return self.model.apply({"params": params}, x)

        self.apply_fn = apply_fn

        if args.phase == "train":
            if self.rank <= 0:
                logging.info("init criterion and optimizer...")
                if getattr(args, "loss_mse", False):
                    logging.info("  using mse loss...")
                if getattr(args, "loss_l1", False):
                    logging.info("  using l1 loss...")
            self.optimizer = make_optimizer(getattr(args, "weight_decay", 0.0))
            params = put_replicated(self.mesh, self.params)
            # commit the WHOLE state to the mesh (see trainer_diffusion):
            # avoids a full recompile at the second train step
            self.state = put_replicated(
                self.mesh,
                create_train_state(params, self.optimizer, with_ema=False),
            )
            self.train_step = make_denoising_train_step(
                apply_fn,
                self.optimizer,
                loss_l1=getattr(args, "loss_l1", False),
                loss_mse=getattr(args, "loss_mse", False),
                lambda_l1=getattr(args, "lambda_l1", 1.0),
                lambda_mse=getattr(args, "lambda_mse", 1.0),
                use_sna=getattr(args, "use_sna", False),
            )
            snap, tag = self._auto_resume
            if tag is not None:
                opt_path = os.path.join(snap, f"optimizer_G_{tag}")
                if ckpt.component_exists(opt_path):
                    self._apply_opt_component(
                        ckpt.load_opt_component(
                            opt_path, self.state.opt_state, self.state.step
                        )
                    )
            if getattr(args, "resume_optim", ""):
                self._apply_opt_component(
                    ckpt.load_opt_component(
                        args.resume_optim, self.state.opt_state, self.state.step
                    )
                )

    def _init_params(self, args):
        rng = jax.random.fold_in(self.rng, 123)
        s = args.crop_size
        return jax.jit(self.model.init)(rng, jnp.zeros((1, s, s, 4)))["params"]

    def _prepare(self, batch):
        device_batch = {
            "noisy_img": batch["noisy_img"],
            "clean_img": batch["clean_img"],
        }
        for k in ("iso", "ratio"):
            if k in batch:
                device_batch[k] = batch[k]
            else:  # PG dataset has no iso/ratio; SNA is off there
                device_batch[k] = np.zeros(batch["noisy_img"].shape[0], np.float32)
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
        last_batch = None

        for epoch in range(args.start_iter, args.max_iter):
            lr = denoising_staircase_lr(args.lr, args.max_iter, epoch)
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )
            logging.info("current_lr: %f", lr)
            self.train_dataloader.set_epoch(epoch)

            for j, batch in enumerate(self.train_dataloader):
                device_batch = self._prepare(batch)
                with mesh_activate(self.mesh):
                    self.state, metrics = self.train_step(
                        self.state, device_batch, rng_train
                    )
                timer.tick()
                last_batch = batch

                if j % args.log_freq == 0 and self.rank <= 0:
                    parts = [f"epoch:{epoch:03d} step:{j:04d} "]
                    for k in ("mse_loss", "l1_loss"):
                        if k in metrics:
                            parts.append(f"{k}:{float(metrics[k]):.06f} ")
                    parts.append(f"loss_sum:{float(metrics['loss_sum']):f} ")
                    parts.append(f"{timer.rate_and_reset():4.6f}s/batch")
                    logging.info("".join(parts))
                if tb is not None and steps % args.vis_step_freq == 0:
                    for k in ("mse_loss", "l1_loss"):
                        if k in metrics:
                            tb.add_scalar(k, float(metrics[k]), steps)
                steps += 1

            if epoch % getattr(args, "vis_freq", 100) == 0 and self.rank <= 0:
                self._vis(epoch, last_batch)

            if epoch % args.save_epoch_freq == 0 and self.rank <= 0:
                logging.info("Saving state, epoch: %d iter:0", epoch)
                self.save_networks("net", epoch)
                self.save_networks("optimizer_G", epoch)

        if self.rank <= 0:
            if tb is not None:
                tb.close()
            self.save_networks("net", "final")
            logging.info("The training stage is over!!!")

    def _vis(self, epoch: int, batch):
        """noisy|clean|output RGB strips (trainer_denoising.py:263-277), via
        PIL (cv2 is not on TPU hosts). Channels 0..2 of the packed image."""
        if batch is None:
            return
        try:
            from PIL import Image
        except Exception:
            return
        vis_dir = getattr(
            self.args, "vis_save_dir", os.path.join(self.args.save_folder, "vis")
        )
        os.makedirs(vis_dir, exist_ok=True)
        noisy = batch["noisy_img"][0]
        clean = batch["clean_img"][0]
        out = np.asarray(
            self.apply_fn(self.state.params, jnp.asarray(noisy[None]))
        )[0].astype(np.float32)
        strip = np.concatenate(
            [np.clip(x[..., :3], 0, 1) for x in (noisy, clean, out)], axis=1
        )
        img = (strip * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(vis_dir, f"vis_{epoch}.jpg"))

    def test(self):
        """Forward pass over the test loader (vestigial in the reference too —
        trainer_denoising.py:294-313; the real eval harness is the
        test_denoising CLI)."""
        params = self.state.params if hasattr(self, "state") else self.params
        for batch in self.test_dataloader:
            out = self.apply_fn(params, jnp.asarray(batch["noisy_img"]))
            jax.block_until_ready(out)

    # ------------------------------------------------------------------
    def save_networks(self, net_name: str, epoch):
        snapshot_dir = getattr(
            self.args, "snapshot_save_dir", os.path.join(self.args.save_folder, "snapshot")
        )
        os.makedirs(snapshot_dir, exist_ok=True)
        if net_name == "net":
            tree = self.state.params if hasattr(self, "state") else self.params
        elif net_name == "optimizer_G":
            tree = self._opt_component()
        else:
            raise ValueError(net_name)
        ckpt.save_component(snapshot_dir, net_name, epoch, tree)

    def _opt_component(self):
        """'optimizer_G' snapshot payload: Adam moments + train step counter
        (the step drives per-step RNG folding, so a resumed run continues the
        uninterrupted augmentation stream)."""
        return {"opt_state": self.state.opt_state, "step": self.state.step}

    def _apply_opt_component(self, restored):
        opt_state, step = restored
        put = lambda t: put_replicated(self.mesh, t)
        self.state = self.state.replace(
            opt_state=put(opt_state),
            step=self.state.step if step is None else put(step),
        )

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
