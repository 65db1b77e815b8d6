"""Shared CLI plumbing for the four entry points.

Parity target: the env/dist/logging boilerplate every reference CLI repeats
(train_diffusion.py:116-156): seeding, distributed setup, save-folder
layout, logger, print_args. The reference's GPU/NCCL knobs map to their
TPU-native equivalents:

  --gpu_ids        accepted for CLI compatibility; device selection is
                   owned by the jax runtime (all local TPU chips are used)
  --launcher       'none' | 'pytorch' (accepted alias) — multi-host runs
                   initialise jax.distributed from the standard TPU env
                   instead of NCCL RANK/WORLD_SIZE rendezvous
"""
from __future__ import annotations

import logging
import os
import random
import time

import numpy as np

from ..utils.logging import print_args, setup_logger


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # device-side RNG is explicit PRNGKey(seed) threading — no global to seed


def add_device_flags(parser) -> None:
    parser.add_argument("--gpu_ids", type=str, default="0",
                        help="accepted for reference-CLI compatibility; "
                             "jax owns device selection on TPU")
    parser.add_argument("--launcher", choices=["none", "pytorch", "jax"],
                        default="none", help="job launcher")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--mixed_precision", action="store_true", default=True)
    parser.add_argument("--no_mixed_precision", dest="mixed_precision",
                        action="store_false")
    parser.add_argument("--profile", action="store_true",
                        help="dump a jax.profiler trace of train steps 5-9")


def init_distributed(args) -> None:
    """Multi-host setup: jax.distributed from the TPU environment (replaces
    dist.init_process_group('nccl') — train_diffusion.py:18-25)."""
    from ..utils.compilation_cache import enable as _enable_cache

    _enable_cache()  # every CLI goes through here before compiling anything
    if args.launcher == "none":
        args.dist = False
        args.rank = -1
        args.world_size = 1
        print("Disabled distributed training.")
        return
    import jax

    if args.launcher in ("pytorch", "jax"):
        # 'pytorch' accepted as an alias so reference command lines run as-is
        if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
        args.dist = jax.process_count() > 1
        args.world_size = jax.process_count()
        args.rank = jax.process_index() if args.dist else -1
        if args.dist:
            _warmup_collectives()


def _warmup_collectives() -> None:
    """Establish the cross-process collective context while the ranks are
    still in lockstep from the jax.distributed rendezvous.

    On the CPU backend XLA's gloo communicator is created lazily at the
    first collective, and its key-value rendezvous has a short (~30s)
    timeout; if the first collective sits behind a big model compile, rank
    compile-time skew (one rank loads an AOT cache hit, another compiles
    cold) blows that window and the job deadlocks. The communicator is
    cached per clique process-wide, so one tiny psum here pins it for every
    later jit. On TPU this is a single cheap ICI all-reduce."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("warmup",))
    local = np.zeros((jax.local_device_count(),), np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("warmup")), local
    )
    out = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(x)
    jax.block_until_ready(out)


def setup_run_dirs(args, with_logger: bool = True) -> None:
    args.save_folder = os.path.join(args.save_folder, args.name)
    args.vis_save_dir = os.path.join(args.save_folder, "vis")
    args.snapshot_save_dir = os.path.join(args.save_folder, "snapshot")
    if getattr(args, "rank", -1) <= 0:
        os.makedirs(args.vis_save_dir, exist_ok=True)
        os.makedirs(args.snapshot_save_dir, exist_ok=True)
        if with_logger:
            log_file = os.path.join(
                args.save_folder, time.strftime("%Y%m%d_%H%M%S") + ".log"
            )
            setup_logger(log_file)
    print_args(args)
