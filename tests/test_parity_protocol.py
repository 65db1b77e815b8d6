"""The PARITY.md data-gated protocol commands must argparse, always.

PARITY.md §"Data-gated parity protocol" publishes the exact commands to run
the two real-data quality gates the day SID/ELD data is mounted (reference
protocols: test_denoising.py:439-516 PSNR/SSIM; utils/util.py:188-256 KLD).
Prose commands rot; these tests feed the same argv lists to the real
parsers so a flag rename breaks CI, not the parity run.
"""
import pytest

from noisediff_tpu.cli import eval_kld, test_denoising, test_diffusion


def test_parity_cmd1_denoiser_psnr_argv():
    # PARITY.md gate 1 (SID), verbatim modulo $VAR substitution
    args = test_denoising.build_parser().parse_args(
        [
            "--net_name", "LSID",
            "--test_dataset", "SID",
            "--sid_folder", "/data/SID",
            "--resources_path", "/data/resources",
            "--resume", "/ckpt/lsid",
            "--correct_darkshading",
            "--correct_illum",
            "--ratio", "100",
        ]
    )
    assert args.net_name == "LSID"
    assert args.test_dataset == "SID"
    assert args.correct_darkshading and args.correct_illum


def test_parity_cmd1_eld_variant_argv():
    args = test_denoising.build_parser().parse_args(
        [
            "--net_name", "LSID",
            "--test_dataset", "ELD",
            "--eld_folder", "/data/ELD",
            "--resources_path", "/data/resources",
            "--resume", "/ckpt/lsid",
            "--correct_darkshading",
            "--correct_illum",
            "--ratio", "100",
        ]
    )
    assert args.test_dataset == "ELD"
    assert args.eld_folder == "/data/ELD"


def test_parity_cmd2_generation_argv():
    # PARITY.md gate 2 generation leg — includes the reference's
    # `--iso`→`--iso_value` argparse prefix-abbreviation quirk
    args = test_diffusion.build_parser().parse_args(
        [
            "--name", "ISO1600_Ratio100",
            "--save_npy",
            "--resume", "/ckpt/diff",
            "--testset", "NoiseImageGenerationDataset",
            "--net_name", "NoiseDiffNet",
            "--beta_schedule", "sigmoid2",
            "--positional_encoding",
            "--with_camera_settings",
            "--dim", "48",
            "--crop_size", "512",
            "--iso", "1600",
            "--ratio", "100",
            "--sid_folder", "/data/SID",
            "--save_folder", "./generated",
        ]
    )
    assert args.name == "ISO1600_Ratio100"
    assert args.iso_value == 1600  # prefix abbreviation must keep resolving
    assert args.ratio_value == 100
    assert args.dim == 48 and args.crop_size == 512


def test_parity_cmd2_kld_argv():
    args = eval_kld.build_parser().parse_args(
        [
            "--generated", "./generated/ISO1600_Ratio100/npy/generated",
            "--sid_folder", "/data/SID",
            "--iso", "1600",
            "--ratio", "100",
        ]
    )
    assert args.iso == 1600
    assert args.ratio == 100


def test_script_sh_train_commands_argv():
    # script.sh's cookbook lines must keep argparsing too (reference
    # counterpart: /root/reference/script.sh)
    import re

    from noisediff_tpu.cli import train_denoising, train_diffusion

    with open("script.sh") as f:
        lines = [ln.strip() for ln in f if ln.strip().startswith("python")]
    parsers = {
        "train_diffusion.py": train_diffusion.build_parser,
        "train_denoising.py": train_denoising.build_parser,
        "test_diffusion.py": test_diffusion.build_parser,
        "test_denoising.py": test_denoising.build_parser,
    }
    checked = 0
    for ln in lines:
        for script, bp in parsers.items():
            if script in ln:
                argv = re.split(r"\s+", ln.split(script, 1)[1].strip())
                argv = [a for a in argv if a and a != "\\"]
                bp().parse_args(argv)
                checked += 1
    assert checked >= 2, f"script.sh cookbook lines not found ({checked})"
