"""Denoiser evaluation CLI — the PSNR/SSIM parity gate.

Parity target: reference `test_denoising.py` (main :364-516, helpers
:59-361): build LSID, load weights, iterate the SID test list (ELD
eval+test lists joined with SID ISO/ratio, filtered by --ratio) or the ELD
scene layout, per image pack (optionally darkshading-corrected) * ratio,
infer, optional illuminance correction, skimage-protocol PSNR/SSIM
(data_range=1), optional PNG dump, print the means.

TPU-native: packing/ratio/clip, the network forward, the illuminance
correction, and PSNR/SSIM all run on-device in one jit per frame shape;
LibRaw decode (or .npy sidecars) stays at the host edge.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..config import add_path_flags, paths_from_args
from .common import add_device_flags, init_distributed, set_random_seed
from ..utils.logging import print_args


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Denoising eval")
    parser.add_argument("--random_seed", default=0, type=int)
    parser.add_argument("--phase", default="test", type=str)

    add_device_flags(parser)

    ## estimation
    parser.add_argument("--noise_param_estm", action="store_true")
    parser.add_argument("--visualize_img", action="store_true")
    parser.add_argument("--correct_illum", action="store_true")
    parser.add_argument("--correct_darkshading", action="store_true")

    ## network setting
    parser.add_argument("--net_name", default="LSID", type=str)
    parser.add_argument("--dim", default=48, type=int)
    parser.add_argument("--lsid_width", default=32, type=int,
                        help="LSID level-1 width (extension; 32 = reference)")
    parser.add_argument("--inp_dim", default=4, type=int)
    parser.add_argument("--cond_dim", default=4, type=int)

    ## dataloader setting
    parser.add_argument("--iso", type=int, default=250)
    parser.add_argument("--ratio", type=int, default=300)
    parser.add_argument("--test_dataset", default="SID", type=str, help="SID | ELD")
    add_path_flags(parser)

    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--save_folder",
                        default="../logs/denoising/inference_withdarkshading", type=str)
    return parser


def evaluate(args) -> dict:
    """Run the eval loop; returns {'PSNR': mean, 'SSIM': mean, 'n': count}."""
    import jax
    import jax.numpy as jnp

    from ..data import manifest
    from ..data.raw_host import Darkshading, decode_bayer, metainfo
    from ..models import define_network
    from ..ops import metrics as M
    from ..ops import raw as raw_ops
    from ..train import checkpoint as ckpt
    from ..train.torch_import import import_torch_params

    paths = paths_from_args(args)
    model = define_network(args.net_name, args, dtype=None)

    ## file list
    if args.test_dataset == "SID":
        eld_val = args.eld_val_list or os.path.join(paths.data_folder, "ELD_Sony_val.txt")
        eld_test = args.eld_test_list or os.path.join(paths.data_folder, "ELD_Sony_test.txt")
        input_list = []
        for sid_list, eld_list in ((paths.val_list, eld_val), (paths.test_list, eld_test)):
            if os.path.exists(eld_list) and os.path.exists(sid_list):
                input_list += manifest.eld_list_with_iso(sid_list, eld_list)
        if not input_list and os.path.exists(paths.test_list):
            # fall back to the full SID test list when the ELD-eval sublists
            # aren't present alongside the dataset
            input_list = [
                (e.in_fn, e.gt_fn, e.iso, e.ratio)
                for e in manifest.parse_sid_list(paths.test_list)
            ]
        pairs = [
            (
                os.path.join(paths.short_dir(), in_fn),
                os.path.join(paths.long_dir(), gt_fn),
                iso,
                ratio,
            )
            for (in_fn, gt_fn, iso, ratio) in input_list
            if ratio == args.ratio
        ]
    elif args.test_dataset == "ELD":
        scene_pairs = manifest.eld_scene_paths(paths.eld_folder, args.ratio)
        pairs = []
        for in_path, gt_path in scene_pairs:
            iso_in, _ = metainfo(in_path)
            pairs.append((in_path, gt_path, iso_in, args.ratio))
    else:
        raise NotImplementedError(args.test_dataset)

    ## params: init abstractly at a small shape, then load weights
    import jax.random as jrandom

    params = jax.jit(model.init)(jrandom.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    if args.resume:
        if args.resume.endswith((".pth", ".pt")):
            sd = ckpt.load_component(args.resume)
            params = import_torch_params(jax.tree.map(np.asarray, params), sd)
        else:
            params = ckpt.load_component(args.resume, like=params)

    darkshading = Darkshading(paths.resources_path) if args.correct_darkshading else None

    @jax.jit
    def process(params, noisy, clean):
        out = jnp.clip(model.apply({"params": params}, noisy[None])[0], 0.0, 1.0)
        if args.correct_illum:
            out = M.illuminance_correct(out, clean)
        return out, M.psnr(out, clean, 1.0), M.ssim(out, clean, 1.0)

    psnrs, ssims = [], []
    for in_path, gt_path, iso, ratio in pairs:
        bayer_in = decode_bayer(in_path)
        bayer_gt = decode_bayer(gt_path)
        test_ratio = float(args.ratio)
        if args.correct_darkshading:
            ds = darkshading.get(int(iso))
            noisy = raw_ops.pack_raw_withdarkshading(
                jnp.asarray(bayer_in), jnp.asarray(ds), test_ratio
            ) * test_ratio
        else:
            noisy = raw_ops.pack_raw(jnp.asarray(bayer_in)) * test_ratio
        noisy = jnp.clip(noisy, 0.0, 1.0)
        clean = jnp.clip(raw_ops.pack_raw(jnp.asarray(bayer_gt)), 0.0, 1.0)

        out, p, s = process(params, noisy, clean)
        psnrs.append(float(p))
        ssims.append(float(s))
        print(f"Current PSNR: {psnrs[-1]}, SSIM: {ssims[-1]}")

        if args.visualize_img:
            _save_visual(args, in_path, gt_path, np.asarray(out))

    mean_psnr = float(np.mean(psnrs)) if psnrs else float("nan")
    mean_ssim = float(np.mean(ssims)) if ssims else float("nan")
    print(f"===> Averaged PSNR: {mean_psnr}, SSIM:{mean_ssim}")
    return {"PSNR": mean_psnr, "SSIM": mean_ssim, "n": len(psnrs)}


def _save_visual(args, in_path: str, gt_path: str, out_hwc4: np.ndarray) -> None:
    """PNG dump. With rawpy present this follows postprocess_bayer
    (test_denoising.py:267-298: write the 4ch back into the raw buffer by
    raw_pattern, LibRaw postprocess with camera WB, half size); otherwise a
    PIL RGB preview of channels (R, (G1+G2)/2, B)."""
    if args.test_dataset == "ELD":
        scene_name, image_name = in_path.split("/")[-2:]
        image_name = scene_name + "_" + image_name.split(".ARW")[0]
    else:
        image_name = os.path.basename(in_path).split(".ARW")[0].split(".npy")[0]
    out_file = os.path.join(args.save_folder, f"{image_name}_output.png")
    os.makedirs(args.save_folder, exist_ok=True)
    try:
        import rawpy  # type: ignore

        raw = rawpy.imread(gt_path)
        pattern = raw.raw_pattern
        bl = np.array(raw.black_level_per_channel)[:, None, None]
        img = np.clip(out_hwc4, 0, 1).transpose(2, 0, 1)
        img = img * (16383 - bl) + bl
        vis = raw.raw_image_visible
        H, W = vis.shape
        locs = {int(pattern[r, c]): (r, c) for r in range(2) for c in range(2)}
        for ch, code in enumerate((0, 1, 2, 3)):  # R, G1, B, G2
            r, c = locs[code]
            vis[r:H:2, c:W:2] = img[ch]
        rgb = raw.postprocess(
            use_camera_wb=True, half_size=True, no_auto_bright=True, output_bps=8
        )
        from PIL import Image

        Image.fromarray(rgb.astype(np.uint8)).save(out_file)
    except Exception:
        from PIL import Image

        rgb = np.stack(
            [
                out_hwc4[..., 0],
                0.5 * (out_hwc4[..., 1] + out_hwc4[..., 3]),
                out_hwc4[..., 2],
            ],
            axis=-1,
        )
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(out_file)


def main(argv=None):
    args = build_parser().parse_args(argv)
    set_random_seed(args.random_seed)
    init_distributed(args)
    if args.visualize_img:
        os.makedirs(args.save_folder, exist_ok=True)
    print_args(args)
    evaluate(args)


if __name__ == "__main__":
    main()
