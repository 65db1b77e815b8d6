"""eval_kld CLI test on a miniature tree: real-vs-generated KLD is near zero
when the generated noise is drawn from the real residual distribution, and
large for a mismatched distribution."""
import json
import os

import numpy as np
import pytest

from noisediff_tpu.cli import eval_kld

H_BAYER, W_BAYER = 64, 96


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "SID"
    (root / "Sony" / "short").mkdir(parents=True)
    (root / "Sony" / "long").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in (1, 2):
        in_fn, gt_fn = f"{i:05d}_00_0.04s.ARW", f"{i:05d}_00_10s.ARW"
        clean = rng.integers(600, 2000, size=(H_BAYER, W_BAYER)).astype(np.float64)
        # 1.5 DN read noise -> ~0.024 in the ratio-amplified normalised
        # domain, well inside the [-0.1, 0.1] histogram support
        noise_dn = rng.normal(0, 1.5, size=clean.shape)
        noisy = np.clip(clean / 250.0 + 512 * (1 - 1 / 250.0) + noise_dn, 0, 16383)
        np.save(root / "Sony" / "short" / (in_fn + ".npy"), noisy.astype(np.uint16))
        np.save(root / "Sony" / "long" / (gt_fn + ".npy"), clean.astype(np.uint16))
        lines.append(f"./Sony/short/{in_fn} ./Sony/long/{gt_fn} ISO800 F1.8")
    (root / "Sony_train_list.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_eval_kld_cli(tree, capsys):
    # derive the actual real-noise distribution, then fabricate "generated"
    # patches from it (low KLD) and from a much wider one (high KLD)
    from noisediff_tpu.config import paths_from_args
    import argparse

    paths_args = argparse.Namespace(sid_folder=str(tree / "SID"))
    paths = paths_from_args(paths_args)
    real = eval_kld.real_noise_samples(paths, 800, 250.0, max_pairs=2)

    rng = np.random.default_rng(1)
    good_dir = tree / "gen_good"
    bad_dir = tree / "gen_bad"
    good_dir.mkdir()
    bad_dir.mkdir()
    for i in range(4):
        np.save(good_dir / f"a+b+{i}_0.npy",
                rng.choice(real, size=(4, 16, 16)).astype(np.float32))
        np.save(bad_dir / f"a+b+{i}_0.npy",
                rng.normal(0, 0.2, size=(4, 16, 16)).astype(np.float32))

    def run(gen_dir):
        eval_kld.main([
            "--iso", "800", "--ratio", "250",
            "--generated", str(gen_dir),
            "--sid_folder", str(tree / "SID"),
        ])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    good = run(good_dir)
    bad = run(bad_dir)
    # 'good' KLD is limited by histogram sampling noise (few fabricated
    # patches); the discrimination margin is what matters
    assert good["kld_symmetric"] < 0.3
    assert bad["kld_symmetric"] > good["kld_symmetric"] * 5
