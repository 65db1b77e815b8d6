"""Closed-loop learning gate: prove the pipeline LEARNS, with no SID data.

Synthesises a dataset from a KNOWN Poisson-Gaussian noise model, then runs
the full two-stage pipeline through the real CLIs and gates on statistics:

  1. build a miniature SID tree whose short exposures carry
     noisy_dn = k*Poisson(latent/k) + N(0, sqrt(var)) noise (the reference's
     own synthesis model, dataset_denoising.py:331-345);
  2. measure the noise-realism KLD of an UNTRAINED model's generations
     (baseline) under the reference protocol (utils/util.py:188-256, our
     cli/eval_kld);
  3. train NoiseDiffNet (reduced dim) via train_diffusion for a bounded
     budget, mass-generate with DDIM via test_diffusion, re-measure KLD:
     the trained KLD must be a small fraction of the untrained KLD;
  4. train LSID on the generated pairs via train_denoising and assert the
     denoised PSNR beats the noisy-input PSNR on held-out frames.

Scales: --scale tiny (CPU, minutes — what tests/test_learning_gate.py
runs), --scale tpu (the real gate; numbers recorded in BENCH_NOTES.md /
LEARNING_GATE.json).

Usage:
    python scripts/learning_gate.py --workdir /tmp/gate --scale tiny
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLACK, WHITE = 512, 16383
SCALE = WHITE - BLACK

SCALES = {
    # frames: (bayer_h, bayer_w); model dim; crop (packed px); epochs;
    # batch; diffusion T; DDIM steps; LSID width/epochs. An 'epoch' is the
    # rebalanced SID list (~100 samples), so diffusion steps ~= epochs *
    # 100 / batch. Budgets sized so stage-1 actually converges: an
    # undertrained model generates near the N(0,1) prior (std ~0.6 vs the
    # real residual's ~0.05) and poisons stage 2.
    "tiny": dict(fh=96, fw=128, n_train=4, n_test=2, dim=16, crop=16,
                 epochs=160, batch=8, T=64, ddim=16, dpm=0,
                 dpm_spacing="time", lr=3e-4,
                 lsid_width=8, den_epochs=60, den_lr=1e-3,
                 den_crop=16, gen_batch=16),
    "small": dict(fh=192, fw=256, n_train=6, n_test=2, dim=32, crop=32,
                  epochs=80, batch=8, T=256, ddim=25, dpm=10,
                  dpm_spacing="lambda", lr=3e-4,
                  lsid_width=8, den_epochs=30, den_lr=1e-3,
                  den_crop=32, gen_batch=16),
    "tpu": dict(fh=512, fw=768, n_train=8, n_test=3, dim=48, crop=64,
                epochs=800, batch=16, T=1000, ddim=50, dpm=10,
                dpm_spacing="lambda", lr=2e-4,
                lsid_width=16, den_epochs=150, den_lr=5e-4,
                den_crop=64, gen_batch=32),
}

ISO, RATIO = 800, 100.0
# DN-domain Poisson gain / Gaussian read variance. VAR sized so the
# noisy-input PSNR sits ~24 dB: hard enough that a denoiser must learn to
# beat it, mild enough that the residuals stay inside the reference KLD
# histogram support ([-0.1, 0.1] at ratio 100).
K_TRUE, VAR_TRUE = 0.65, 60.0


def synth_scene(rng, fh, fw):
    """Smooth random radiance field in DN (above black), [~200, ~12000]."""
    lo = rng.uniform(0.0, 1.0, size=(fh // 16, fw // 16))
    up = np.kron(lo, np.ones((16, 16)))
    # mild per-pixel texture so scenes aren't piecewise constant
    up = up + rng.uniform(-0.03, 0.03, size=up.shape)
    return np.clip(200.0 + up * 11800.0, 0.0, WHITE - BLACK - 600.0)


def pg_noisy(rng, clean_dn, ratio, k=K_TRUE, var=VAR_TRUE):
    latent = clean_dn / ratio
    poisson = k * rng.poisson(latent / k).astype(np.float64)
    gauss = rng.normal(0.0, np.sqrt(var), size=clean_dn.shape)
    return poisson + gauss


def build_tree(root, cfg, seed=0):
    sid = os.path.join(root, "SID")
    os.makedirs(os.path.join(sid, "Sony", "short"), exist_ok=True)
    os.makedirs(os.path.join(sid, "Sony", "long"), exist_ok=True)
    rng = np.random.default_rng(seed)
    train_lines, test_lines = [], []
    n = cfg["n_train"] + cfg["n_test"]
    for i in range(1, n + 1):
        clean = synth_scene(rng, cfg["fh"], cfg["fw"])
        noisy = pg_noisy(rng, clean, RATIO)
        in_fn, gt_fn = f"{i:05d}_00_0.1s.ARW", f"{i:05d}_00_10s.ARW"
        np.save(os.path.join(sid, "Sony", "long", gt_fn + ".npy"),
                np.clip(clean + BLACK, 0, WHITE).astype(np.uint16))
        np.save(os.path.join(sid, "Sony", "short", in_fn + ".npy"),
                np.clip(noisy + BLACK, 0, WHITE).astype(np.uint16))
        line = f"./Sony/short/{in_fn} ./Sony/long/{gt_fn} ISO{ISO} F1.8"
        (train_lines if i <= cfg["n_train"] else test_lines).append(line)
    with open(os.path.join(sid, "Sony_train_list.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(sid, "Sony_test_list.txt"), "w") as f:
        f.write("\n".join(test_lines) + "\n")
    return sid


def common_flags(workdir, sid):
    import jax

    precision = [] if jax.default_backend() == "tpu" else ["--no_mixed_precision"]
    return [
        "--sid_folder", sid,
        "--pretrained_dir", workdir,
        "--num_workers", "1",
        *precision,
    ]


def diffusion_flags(cfg):
    return [
        "--net_name", "NoiseDiffNet",
        "--beta_schedule", "sigmoid2",
        "--positional_encoding",
        "--with_camera_settings",
        "--dim", str(cfg["dim"]),
        "--crop_size", str(cfg["crop"]),
        "--diffusion_steps", str(cfg["T"]),
    ]


def run_generation(cfg, workdir, sid, out_name, resume,
                   sampler=None, steps=None, spacing=None):
    from noisediff_tpu.cli import test_diffusion as td

    out = os.path.join(workdir, out_name)
    td.main([
        "--name", f"ISO{ISO}_Ratio{int(RATIO)}",
        "--resume", resume,  # "" = random init (the untrained baseline)
        "--testset", "NoiseImageGenerationDataset",
        "--save_npy",
        *diffusion_flags(cfg),
        "--batch_size", str(cfg["gen_batch"]),
        "--sampling_timesteps", str(steps if steps else cfg["ddim"]),
        *(["--sampler", sampler] if sampler else []),
        *(["--dpm_spacing", spacing] if spacing else []),
        "--iso_value", str(ISO),
        "--ratio_value", str(int(RATIO)),
        "--save_folder", out,
        *common_flags(workdir, sid),
    ])
    return os.path.join(out, f"ISO{ISO}_Ratio{int(RATIO)}", "npy", "generated")


def run_kld(workdir, sid, gen_dir):
    from noisediff_tpu.cli import eval_kld

    out = os.path.join(workdir, "kld.json")
    eval_kld.main([
        "--iso", str(ISO),
        "--ratio", str(RATIO),
        "--generated", gen_dir,
        "--out", out,
        "--sid_folder", sid,
        "--pretrained_dir", workdir,
    ])
    with open(out) as f:
        return json.load(f)


def noisy_input_psnr(sid, paths_pretrained):
    """Mean PSNR of clip(pack(short)*ratio) vs pack(long) on the test list."""
    from noisediff_tpu.data import manifest
    from noisediff_tpu.data.raw_host import load_packed

    vals = []
    for e in manifest.parse_sid_list(os.path.join(sid, "Sony_test_list.txt")):
        noisy = np.clip(
            load_packed(os.path.join(sid, e.in_path), rescale=False) * e.ratio,
            0, SCALE,
        ) / SCALE
        clean = load_packed(os.path.join(sid, e.gt_path), rescale=True)
        mse = float(np.mean((noisy - clean) ** 2))
        vals.append(10.0 * np.log10(1.0 / mse))
    return float(np.mean(vals))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--scale", choices=sorted(SCALES), default="tiny")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: wiped first)")
    ap.add_argument("--out", default="", help="write the result JSON here")
    ap.add_argument("--platform", default="",
                    help="force a jax backend, e.g. 'cpu' (the axon TPU "
                         "plugin ignores JAX_PLATFORMS; this goes through "
                         "jax.config). Default: the environment's backend.")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="override a scale knob, e.g. --set epochs=40")
    ap.add_argument("--restamp_dpm", action="store_true",
                    help="re-certify ONLY the DPM leg of an existing gate "
                         "workdir (trained snapshot + SID tree) at the "
                         "scale's current dpm/dpm_spacing config, and patch "
                         "the dpm_* fields of the --out artifact in place. "
                         "Use after flipping the production sampler default "
                         "so the artifact keeps describing what ships.")
    args = ap.parse_args(argv)
    cfg = dict(SCALES[args.scale])
    for kv in getattr(args, "set"):
        k, v = kv.split("=", 1)
        if k not in cfg:
            raise SystemExit(f"unknown knob {k!r}; knobs: {sorted(cfg)}")
        cfg[k] = type(cfg[k])(v)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.restamp_dpm:
        assert cfg["dpm"] > 0, "restamp needs a dpm step count for the scale"
        sid = os.path.join(args.workdir, "SID")
        snap = os.path.join(args.workdir, "logs", "weights", "gate_diff",
                            "snapshot")
        ema = os.path.join(snap, "ema_final")
        resume = ema if os.path.isdir(ema) or os.path.exists(ema + ".npz") \
            else os.path.join(snap, "net_final")
        assert os.path.isdir(sid), f"no SID tree under {args.workdir}"
        assert args.out and os.path.exists(args.out), \
            "--restamp_dpm patches an existing --out artifact"
        spacing = cfg.get("dpm_spacing", "time")
        gen_dpm = run_generation(
            cfg, args.workdir, sid, f"gen_dpm{cfg['dpm']}_{spacing}_restamp",
            resume=resume, sampler="dpm", steps=cfg["dpm"], spacing=spacing,
        )
        kld_dpm = run_kld(args.workdir, sid, gen_dpm)
        with open(args.out) as f:
            result = json.load(f)
        result["kld_trained_dpm"] = kld_dpm
        result["dpm_steps"] = cfg["dpm"]
        result["dpm_spacing"] = spacing
        result["dpm_vs_ddim_kld_ratio"] = (
            kld_dpm["kld_symmetric"]
            / max(result["kld_trained"]["kld_symmetric"], 1e-12)
        )
        print(json.dumps(result))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        return result

    if os.path.isdir(args.workdir) and not args.keep:
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    sid = build_tree(args.workdir, cfg, seed=args.seed)

    from noisediff_tpu.cli import train_denoising as trden
    from noisediff_tpu.cli import train_diffusion as trd
    from noisediff_tpu.cli.test_denoising import build_parser as den_parser
    from noisediff_tpu.cli.test_denoising import evaluate as den_evaluate

    ## 1. UNTRAINED baseline KLD (random init)
    gen0 = run_generation(cfg, args.workdir, sid, "gen_untrained", resume="")
    kld0 = run_kld(args.workdir, sid, gen0)

    ## 2. train stage 1
    logs = os.path.join(args.workdir, "logs")
    trd.main([
        "--name", "gate_diff",
        "--trainset", "SonyTrainDataset",
        *diffusion_flags(cfg),
        "--batch_size", str(cfg["batch"]),
        "--lr", str(cfg["lr"]),
        "--max_iter", str(cfg["epochs"]),
        "--save_epoch_freq", str(cfg["epochs"]),
        "--log_freq", "200",
        "--save_folder", os.path.join(logs, "weights"),
        *common_flags(args.workdir, sid),
    ])
    snap = os.path.join(logs, "weights", "gate_diff", "snapshot")

    ## 3. generate + KLD with the trained model (EMA weights, like the
    ## reference's shipped artefact)
    ema = os.path.join(snap, "ema_final")
    resume = ema if os.path.isdir(ema) or os.path.exists(ema + ".npz") else \
        os.path.join(snap, "net_final")
    gen1 = run_generation(cfg, args.workdir, sid, "gen_trained", resume=resume)
    kld1 = run_kld(args.workdir, sid, gen1)
    # cheap convergence indicator: the real residual std is ~0.05-0.07;
    # an undertrained model's generations sit near the N(0,1) prior
    gen_std = float(np.std(np.stack([
        np.load(p) for p in sorted(glob.glob(os.path.join(gen1, "*.npy")))[:64]
    ])))

    ## 3b. DPM-Solver++(2M) quality certification (round-2 verdict Weak #3):
    ## regenerate the same (ISO, ratio) noise from the SAME checkpoint with
    ## the production fast path (--sampler dpm at the certified default
    ## step count — 15 since round 4, see scripts/dpm_step_sweep.py — the
    ## config bench.py publishes) and compare its KLD against the DDIM
    ## generation under the reference protocol.
    kld_dpm, dpm_error = None, None
    if cfg["dpm"] > 0:
        try:
            gen_dpm = run_generation(
                cfg, args.workdir, sid, "gen_trained_dpm", resume=resume,
                sampler="dpm", steps=cfg["dpm"],
                spacing=cfg.get("dpm_spacing", "time"),
            )
            kld_dpm = run_kld(args.workdir, sid, gen_dpm)
        except Exception as exc:  # keep stage 2 alive; record the failure
            dpm_error = f"{type(exc).__name__}: {exc}"[:300]

    ## 4. stage 2: train LSID on the generated noise, eval on held-out pairs
    synth_root = os.path.join(args.workdir, "synth")
    synth_dir = os.path.join(synth_root, f"ISO{ISO}_Ratio{int(RATIO)}")
    os.makedirs(synth_dir, exist_ok=True)
    for p in glob.glob(os.path.join(gen1, "*.npy")):
        os.link(p, os.path.join(synth_dir, os.path.basename(p)))
    trden.main([
        "--name", "gate_denoise",
        "--net_name", "LSID",
        "--lsid_width", str(cfg["lsid_width"]),
        "--trainset", "SyntheticNoisDiffDenoisingDataset",
        "--loss_l1",
        "--crop_size", str(cfg["den_crop"]),
        "--batch_size", str(cfg["batch"]),
        "--lr", str(cfg["den_lr"]),
        "--max_iter", str(cfg["den_epochs"]),
        "--save_epoch_freq", str(cfg["den_epochs"]),
        "--log_freq", "200",
        "--vis_freq", "100000",
        "--synthetic_folder", synth_root,
        "--save_folder", os.path.join(logs, "dweights"),
        *common_flags(args.workdir, sid),
    ])
    dsnap = os.path.join(logs, "dweights", "gate_denoise", "snapshot")

    den_args = den_parser().parse_args([
        "--resume", os.path.join(dsnap, "net_final"),
        "--lsid_width", str(cfg["lsid_width"]),
        "--ratio", str(int(RATIO)),
        "--test_dataset", "SID",
        "--save_folder", os.path.join(args.workdir, "eval_out"),
        "--sid_folder", sid,
        "--pretrained_dir", args.workdir,
    ])
    den_args.rank = -1
    res = den_evaluate(den_args)
    psnr_in = noisy_input_psnr(sid, args.workdir)

    result = {
        "scale": args.scale,
        "noise_model": {"K": K_TRUE, "VAR": VAR_TRUE, "iso": ISO,
                        "ratio": RATIO},
        "kld_untrained": kld0,
        "kld_trained": kld1,
        "generated_noise_std": gen_std,
        "kld_improvement": (
            kld0["kld_symmetric"] / max(kld1["kld_symmetric"], 1e-12)
        ),
        "psnr_noisy_input": psnr_in,
        "psnr_denoised": res["PSNR"],
        "psnr_gain": res["PSNR"] - psnr_in,
        "ssim_denoised": res["SSIM"],
        "n_eval_frames": res["n"],
    }
    if dpm_error is not None:
        result["dpm_error"] = dpm_error
    if kld_dpm is not None:
        result["kld_trained_dpm"] = kld_dpm
        result["dpm_steps"] = cfg["dpm"]
        result["dpm_spacing"] = cfg.get("dpm_spacing", "time")
        # certification bar (VERDICT r2 next-#2): DPM KLD within ~1.2x of
        # the DDIM KLD means the 3.8x-faster sampler is quality-equivalent
        result["dpm_vs_ddim_kld_ratio"] = (
            kld_dpm["kld_symmetric"] / max(kld1["kld_symmetric"], 1e-12)
        )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
