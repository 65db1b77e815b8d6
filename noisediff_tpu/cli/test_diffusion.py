"""Diffusion testing CLI — bulk noise-data generation.

Flag-surface parity target: reference `test_diffusion.py:22-114`. Canonical
invocation (script.sh:10 — note '--iso 800 --ratio 250' work through
argparse prefix abbreviation of --iso_value/--ratio_value, preserved here by
defining the same flags):

  python test_diffusion.py --name ISO800Ratio250 --resume <ckpt> \
    --generation_result noise --testset NoiseImageGenerationDataset \
    --save_npy --random_seed 0 --beta_schedule sigmoid2 --batch_size 4 \
    --net_name NoiseDiffNet --positional_encoding --dim 48 --crop_size 512 \
    --with_camera_settings --save_folder ./output/... --iso 800 --ratio 250
"""
from __future__ import annotations

import argparse
import os

from ..config import add_path_flags
from .common import add_device_flags, init_distributed, set_random_seed
from ..utils.logging import print_args


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="NoiseDiff generation")
    parser.add_argument("--random_seed", default=0, type=int)
    parser.add_argument("--name", default="test_diffusion", type=str)
    parser.add_argument("--phase", default="test", type=str)

    add_device_flags(parser)

    ## estimation
    parser.add_argument("--visualize_img", action="store_true")
    parser.add_argument("--visualize_noise", action="store_true")
    parser.add_argument("--save_npy", action="store_true")
    parser.add_argument("--skip_existing", action="store_true",
                        help="resume bulk generation: skip batches whose "
                             "npy outputs already exist (TPU-native "
                             "extension — missing batches regenerate "
                             "bit-identically via the per-batch PRNG)")
    parser.add_argument("--with_camera_settings", action="store_true")
    parser.add_argument("--beta_schedule", default="sigmoid", type=str)
    parser.add_argument("--temperature", default=0.1, type=float)
    parser.add_argument("--positional_encoding", action="store_true")
    parser.add_argument("--normalize_condition", action="store_true")

    ## network setting
    parser.add_argument("--net_name", default="NoiseDiffNet", type=str)
    parser.add_argument("--dim", default=64, type=int)
    parser.add_argument("--inp_dim", default=4, type=int)
    parser.add_argument("--cond_dim", default=4, type=int)

    ## diffusion setting
    parser.add_argument("--diffusion_steps", default=1000, type=int)
    parser.add_argument("--generation_result", default="noise", type=str)
    parser.add_argument("--self_condition", action="store_true")
    parser.add_argument("--auto_normalize", action="store_true")
    parser.add_argument("--diffusion_objective", default="pred_v", type=str)
    parser.add_argument("--dark_frame", action="store_true")
    parser.add_argument("--sampling_timesteps", default=None, type=int,
                        help="enable DDIM with this many steps")
    parser.add_argument("--sampler", default="auto", type=str,
                        help="auto | ddpm | ddim | dpm (DPM-Solver++ 2M, "
                             "framework extension: ~3-5x fewer steps than DDIM)")
    parser.add_argument("--dpm_spacing", default="lambda", type=str,
                        choices=("time", "lambda"),
                        help="DPM-Solver step grid: 'lambda' (uniform in "
                             "log-SNR, the DPM-Solver paper grid — the "
                             "KLD-certified production default) or 'time' "
                             "(DDIM-comparable uniform-in-t)")

    ## dataloader setting
    add_path_flags(parser)
    parser.add_argument("--testset", default="NoiseImageGenerationDataset", type=str)
    parser.add_argument("--crop_size", default=256, type=int)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--iso_value", default=250, type=float)
    parser.add_argument("--ratio_value", default=100, type=float)
    parser.add_argument("--clean_source", default="SID", type=str)

    parser.add_argument("--resume", default=".", type=str)
    parser.add_argument("--save_folder", default="./output/generated_data/noise_imgs_SID_DDPM", type=str)
    return parser


def main(argv=None):
    # generation is inference-only: enable the packed strided-conv dual
    # heads (exact; ~5% per-eval win — BENCH_NOTES). The trainers leave
    # this off because the packed kernel's wgrad is pathological.
    # Users can force it off with NOISEDIFF_PACKED_HEADS=0.
    os.environ.setdefault("NOISEDIFF_PACKED_HEADS", "1")
    args = build_parser().parse_args(argv)
    set_random_seed(args.random_seed)
    init_distributed(args)
    args.save_folder = os.path.join(args.save_folder, args.name)
    os.makedirs(args.save_folder, exist_ok=True)
    print_args(args)

    from ..train.trainer_diffusion import Trainer

    trainer = Trainer(args)
    trainer.test()


if __name__ == "__main__":
    main()
