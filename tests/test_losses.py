"""Loss-library cross-checks against the live reference torch implementations.

Covers the tail the round-1 verdict flagged: the 5 GANLoss variants,
r1_penalty, gradient_penalty_loss (wgan-gp), g_path_regularize, and the
VGGStyleDiscriminator160 forward (reference models/losses.py:243-492).
Internal-randomness functions are compared by feeding torch the exact
noise/alpha the jax side drew (monkeypatched torch.rand/randn_like).

Skipped when the reference tree isn't mounted.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_losses():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models import losses as ref

    return torch, ref


def test_gan_loss_all_types(ref_losses):
    torch, ref = ref_losses
    from noisediff_tpu.models.losses import gan_loss

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 1, 6, 6)).astype(np.float32)
    for gan_type in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
        tl = ref.GANLoss(gan_type, loss_weight=0.5)
        for target_is_real in (True, False):
            for is_disc in (True, False):
                want = tl(
                    torch.from_numpy(pred), target_is_real, is_disc=is_disc
                ).item()
                got = float(
                    gan_loss(pred, target_is_real, gan_type, is_disc,
                             loss_weight=0.5)
                )
                assert got == pytest.approx(want, rel=1e-5), (
                    gan_type, target_is_real, is_disc,
                )


def test_r1_penalty_matches_reference(ref_losses):
    torch, ref = ref_losses
    import jax.numpy as jnp

    from noisediff_tpu.models.losses import r1_penalty

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 2, 5, 5)).astype(np.float32)
    w = rng.normal(size=(2, 5, 5)).astype(np.float32)

    tx = torch.from_numpy(x).requires_grad_(True)
    tpred = (tx ** 3 * torch.from_numpy(w)).sum(dim=(1, 2, 3))
    want = ref.r1_penalty(tpred, tx).item()

    def pred_sum(img):
        return ((img ** 3) * jnp.asarray(w)).sum()

    got = float(r1_penalty(pred_sum, jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-5)


def test_gradient_penalty_matches_reference(ref_losses, monkeypatch):
    torch, ref = ref_losses
    import jax
    import jax.numpy as jnp

    from noisediff_tpu.models.losses import gradient_penalty

    rng = np.random.default_rng(2)
    # NCHW on the torch side; the jax side uses the same layout here so the
    # channel-axis norm semantics line up exactly (channel_axis=1).
    real = rng.normal(size=(4, 3, 6, 6)).astype(np.float32)
    fake = rng.normal(size=(4, 3, 6, 6)).astype(np.float32)
    w = rng.normal(size=(3, 6, 6)).astype(np.float32)

    key = jax.random.PRNGKey(7)
    alpha = jax.random.uniform(key, (4, 1, 1, 1))

    class TorchDisc(torch.nn.Module):
        def forward(self, x):
            return (x ** 2 * torch.from_numpy(w)).sum(dim=(1, 2, 3), keepdim=False)

    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.from_numpy(np.asarray(alpha).copy())
    )
    want = ref.gradient_penalty_loss(
        TorchDisc(), torch.from_numpy(real), torch.from_numpy(fake)
    ).item()

    def disc_sum(x):
        return ((x ** 2) * jnp.asarray(w)).sum()

    got = float(
        gradient_penalty(disc_sum, jnp.asarray(real), jnp.asarray(fake), key,
                         channel_axis=1)
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_g_path_regularize_matches_reference(ref_losses, monkeypatch):
    torch, ref = ref_losses
    import jax
    import jax.numpy as jnp

    from noisediff_tpu.models.losses import g_path_regularize

    b, n_lat, d, c, h, w = 2, 3, 4, 2, 4, 4
    rng = np.random.default_rng(3)
    latents = rng.normal(size=(b, n_lat, d)).astype(np.float32)
    wmap = rng.normal(size=(n_lat, d, c, h, w)).astype(np.float32) * 0.3
    mean_path_length = 0.7

    key = jax.random.PRNGKey(11)

    def gen_fn(z):  # latents -> NHWC fake image
        out = jnp.einsum("bnd,ndchw->bchw", z, jnp.asarray(wmap))
        return jnp.transpose(out, (0, 2, 3, 1))

    fake_shape = (b, h, w, c)
    noise = np.asarray(
        jax.random.normal(key, fake_shape, jnp.float32) / np.sqrt(h * w)
    )

    # feed torch the exact noise jax drew (transposed to NCHW)
    monkeypatch.setattr(
        torch,
        "randn_like",
        lambda t: torch.from_numpy(np.transpose(noise, (0, 3, 1, 2)).copy())
        * np.sqrt(h * w),
    )
    tz = torch.from_numpy(latents).requires_grad_(True)
    tfake = torch.einsum("bnd,ndchw->bchw", tz, torch.from_numpy(wmap))
    want_pen, want_len, want_mean = ref.g_path_regularize(
        tfake, tz, torch.tensor(mean_path_length)
    )

    got_pen, got_len, got_mean = g_path_regularize(
        gen_fn, jnp.asarray(latents), mean_path_length, key
    )
    assert float(got_pen) == pytest.approx(want_pen.item(), rel=1e-4)
    assert float(got_len) == pytest.approx(want_len.item(), rel=1e-4)
    assert float(got_mean) == pytest.approx(want_mean.item(), rel=1e-4)


def _map_vgg_disc_state(sd):
    """torch state_dict -> flax {'params', 'batch_stats'} for
    VGGStyleDiscriminator160."""
    params, stats = {}, {}
    for k, v in sd.items():
        v = v.detach().numpy()
        name, field = k.rsplit(".", 1)
        if name.startswith("conv"):
            if field == "weight":
                params.setdefault(name, {})["kernel"] = np.transpose(
                    v, (2, 3, 1, 0)
                )  # OIHW -> HWIO
            else:
                params.setdefault(name, {})["bias"] = v
        elif name.startswith("bn"):
            if field == "weight":
                params.setdefault(name, {})["scale"] = v
            elif field == "bias":
                params.setdefault(name, {})["bias"] = v
            elif field == "running_mean":
                stats.setdefault(name, {})["mean"] = v
            elif field == "running_var":
                stats.setdefault(name, {})["var"] = v
        elif name.startswith("linear"):
            if field == "weight":
                params.setdefault(name, {})["kernel"] = v.T
            else:
                params.setdefault(name, {})["bias"] = v
    return {"params": params, "batch_stats": stats}


def test_vgg_style_discriminator160_forward_parity(ref_losses):
    torch, ref = ref_losses
    import jax.numpy as jnp

    from noisediff_tpu.models.losses import VGGStyleDiscriminator160

    tnet = ref.VGGStyleDiscriminator160().eval()
    # randomise the running stats so eval-mode BN is non-trivial
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 160, 160)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    model = VGGStyleDiscriminator160()
    variables = _map_vgg_disc_state(tnet.state_dict())
    got = np.asarray(
        model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # param-count pin: every torch parameter mapped, nothing extra
    n_torch = sum(p.numel() for p in tnet.parameters())
    import jax

    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n_flax == n_torch
