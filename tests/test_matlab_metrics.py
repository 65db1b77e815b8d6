"""Parity of the MATLAB-protocol metric helpers and image utils against the
LIVE reference implementation (utils/calculate_PSNR_SSIM.py), plus the
denoiser train-step flip axis (reference flips NCHW dim 2 == height)."""
import importlib.util
import sys

import numpy as np
import pytest

REF = "/root/reference/utils/calculate_PSNR_SSIM.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_psnr_ssim", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_psnr_ssim"] = mod
    spec.loader.exec_module(mod)
    return mod


ref = pytest.importorskip("cv2") and _load_reference()


def test_psnr_matlab_matches_reference():
    from noisediff_tpu.ops.metrics import psnr_matlab

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (32, 48, 3))
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
    assert psnr_matlab(a, b) == pytest.approx(ref.calculate_psnr(a, b), rel=1e-9)
    assert psnr_matlab(a, a) == float("inf")


def test_bgr2ycbcr_matches_reference():
    from noisediff_tpu.ops.metrics import bgr2ycbcr

    rng = np.random.default_rng(1)
    img_f = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    img_u = (img_f * 255).astype(np.uint8)
    for img in (img_f, img_u):
        for only_y in (True, False):
            got = bgr2ycbcr(img.copy(), only_y=only_y)
            want = ref.bgr2ycbcr(img.copy(), only_y=only_y)
            np.testing.assert_allclose(
                np.asarray(got, np.float64), np.asarray(want, np.float64),
                atol=1.0 if img.dtype == np.uint8 else 1e-5,
            )


def test_tensor2img_matches_reference_3d():
    import torch

    from noisediff_tpu.ops.metrics import tensor2img

    rng = np.random.default_rng(2)
    chw = rng.uniform(-0.2, 1.2, (3, 8, 10)).astype(np.float32)
    got = tensor2img(chw)
    want = ref.tensor2img(torch.from_numpy(chw))
    np.testing.assert_array_equal(got, want)
    # 2-D passthrough
    hw = rng.uniform(0, 1, (8, 10)).astype(np.float32)
    np.testing.assert_array_equal(tensor2img(hw), ref.tensor2img(torch.from_numpy(hw)))


def test_ssim_matlab_matches_reference():
    import jax.numpy as jnp

    from noisediff_tpu.ops.metrics import ssim_matlab

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 255, (40, 40)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    got = float(ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    want = float(ref.calculate_ssim(a, b))
    assert got == pytest.approx(want, abs=2e-4)


def test_scandir_and_mkdir_and_rename(tmp_path):
    from noisediff_tpu.utils.fs import mkdir_and_rename, scandir

    (tmp_path / "a.npy").write_bytes(b"x")
    (tmp_path / ".hidden").write_bytes(b"x")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_bytes(b"x")
    assert sorted(scandir(str(tmp_path))) == ["a.npy"]
    assert sorted(scandir(str(tmp_path), recursive=True)) == ["a.npy", "sub/b.txt"]
    assert list(scandir(str(tmp_path), suffix=".txt", recursive=True)) == ["sub/b.txt"]

    d = tmp_path / "run"
    mkdir_and_rename(str(d))
    (d / "marker").write_bytes(b"x")
    mkdir_and_rename(str(d))  # archives the old dir
    assert d.exists() and not (d / "marker").exists()
    archived = [p for p in tmp_path.iterdir() if p.name.startswith("run_archived_")]
    assert len(archived) == 1 and (archived[0] / "marker").exists()


def test_denoise_flip_is_height_axis():
    import jax
    import jax.numpy as jnp

    from noisediff_tpu.train.state import (
        create_train_state,
        make_denoising_train_step,
        make_optimizer,
    )

    # loss-based axis probe: net multiplies by an H-varying mask, data
    # varies along H only and clean == noisy, so with an always-flip RNG
    # loss = mean|flip(noisy)*mask - flip(noisy)| distinguishes an H-flip
    # (reference semantics) from a W-flip
    h, w = 4, 6
    col = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    noisy = jnp.broadcast_to(col, (2, h, w, 1)) + 1.0
    mask = 1.0 + jnp.arange(h, dtype=jnp.float32)[None, :, None, None]

    def apply_fn(params, x):
        return x * mask

    opt = make_optimizer()
    params = {"w": jnp.zeros((1,))}
    state = create_train_state(params, opt, with_ema=False)
    step = make_denoising_train_step(apply_fn, opt, loss_l1=True, augment_flip=True)

    batch = {"noisy_img": noisy, "clean_img": noisy}
    orig = jax.random.bernoulli
    jax.random.bernoulli = lambda *a, **k: jnp.bool_(True)
    try:
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
    finally:
        jax.random.bernoulli = orig
    got = float(metrics["l1_loss"])
    flipped_h = np.asarray(noisy)[:, ::-1, :, :]
    want_h = float(np.mean(np.abs(flipped_h * np.asarray(mask) - flipped_h)))
    want_w = float(np.mean(np.abs(np.asarray(noisy) * np.asarray(mask) - np.asarray(noisy))))
    assert want_h != pytest.approx(want_w)  # probe must discriminate
    assert got == pytest.approx(want_h, rel=1e-6)


def test_tensor2img_grid_matches_torchvision_make_grid():
    """The 4-D path must reproduce make_grid(nrow=int(sqrt(n)), padding=0),
    the exact call the reference tensor2img makes
    (calculate_PSNR_SSIM.py:21)."""
    torchvision = pytest.importorskip("torchvision")
    import torch

    from noisediff_tpu.ops.metrics import tensor2img

    rng = np.random.default_rng(0)
    for n in (4, 5, 9):
        x = rng.random((n, 3, 6, 7)).astype(np.float32)
        want = torchvision.utils.make_grid(
            torch.from_numpy(x), nrow=int(np.sqrt(n)), padding=0, normalize=False
        ).numpy()
        want = np.transpose(want[[2, 1, 0]], (1, 2, 0))  # reference BGR flip
        got = tensor2img(x, out_type=np.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tensor2img_grid_structure():
    """Without torchvision: verify the documented make_grid geometry —
    nrow=int(sqrt(n)) images per row, padding=0, cells intact."""
    from noisediff_tpu.ops.metrics import tensor2img

    rng = np.random.default_rng(1)
    n, c, h, w = 5, 3, 4, 6
    x = rng.random((n, c, h, w)).astype(np.float32)
    got = tensor2img(x, out_type=np.float32)
    xmaps = int(np.sqrt(n))  # 2 per row -> 3 rows
    ymaps = int(np.ceil(n / xmaps))
    assert got.shape == (ymaps * h, xmaps * w, c)
    for i in range(n):
        r, col = divmod(i, xmaps)
        cell = got[r * h: r * h + h, col * w: col * w + w, :]
        np.testing.assert_allclose(cell, np.transpose(x[i][[2, 1, 0]], (1, 2, 0)))
    # the empty 6th cell stays zero
    r, col = divmod(5, xmaps)
    empty = got[r * h: r * h + h, col * w: col * w + w, :]
    assert np.all(empty == 0)
