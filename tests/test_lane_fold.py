"""Width-fold (lane_fold) correctness: the folded forward must equal the
unfolded one with the SAME parameters (the transform is pure layout —
kernel einsums, masked norms, tuple skip-joins; see blocks.fold_width)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models import LSID, NoiseDiffNet
from noisediff_tpu.models.blocks import _fold_conv_kernel, fold_width, unfold_width


def test_fold_conv_kernel_exact():
    k = jax.random.PRNGKey(0)
    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    for (kh, kw, cin, cout) in [(3, 3, 5, 7), (7, 7, 4, 6), (1, 1, 6, 9)]:
        x = jax.random.normal(k, (2, 8, 12, cin))
        w = jax.random.normal(k, (kh, kw, cin, cout)) * 0.2
        ref = conv(x, w)
        out = unfold_width(conv(fold_width(x), _fold_conv_kernel(w, (cin,), 2)))
        np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_noisediffnet_fold_parity():
    k = jax.random.PRNGKey(0)
    b, s = 2, 16
    x = jax.random.normal(k, (b, s, s, 4))
    t = jnp.array([3, 7], jnp.int32)
    cond = {
        "clean_img": jax.random.uniform(jax.random.fold_in(k, 1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.fold_in(k, 2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([5, 24], jnp.int32),
    }
    m0 = NoiseDiffNet(dim=48, lane_fold=False)
    m1 = NoiseDiffNet(dim=48, lane_fold=True)
    p0 = jax.jit(m0.init)(k, x, t, cond)["params"]
    p1 = jax.jit(m1.init)(k, x, t, cond)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert all(
        a.shape == b_.shape
        for a, b_ in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )
    o0 = jax.jit(m0.apply)({"params": p0}, x, t, cond)
    o1 = jax.jit(m1.apply)({"params": p0}, x, t, cond)
    np.testing.assert_allclose(o1, o0, atol=5e-5)


@pytest.mark.slow
def test_lsid_fold_parity():
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (2, 24, 32, 4))
    m0 = LSID(lane_fold=False)
    m1 = LSID(lane_fold=True)
    p0 = jax.jit(m0.init)(k, x)["params"]
    p1 = jax.jit(m1.init)(k, x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    o0 = jax.jit(m0.apply)({"params": p0}, x)
    o1 = jax.jit(m1.apply)({"params": p0}, x)
    np.testing.assert_allclose(o1, o0, atol=5e-5)


@pytest.mark.slow
def test_fold_nonsquare_input():
    # folded path on a non-square (full-frame aspect) input keeps the shape
    k = jax.random.PRNGKey(0)
    xb = jax.random.uniform(k, (1, 16, 24, 4))
    cond = {
        "clean_img": xb,
        "position": jnp.zeros((1, 16, 24, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32),
    }
    mb = NoiseDiffNet(dim=48, lane_fold=True)
    pb = jax.jit(mb.init)(k, xb, jnp.zeros((1,), jnp.int32), cond)["params"]
    out = mb.apply({"params": pb}, xb, jnp.zeros((1,), jnp.int32), cond)
    assert out.shape == xb.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_noisediffnet_fold_parity_small_dim():
    """dim=8 reaches the identity-residual-on-concat branch in a FOLDED
    up stage (x_ch + skip_ch == dim_out at a dim_out < 96 stage) — the
    folded concat must interleave per fold slot, not append (regression:
    a plain concat silently misaligned the residual channels).
    slow: two whole-model forwards (~48 s loaded)."""
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([5])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([3]),
    }
    m0 = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=False)
    m1 = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    params = m0.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    y0 = m0.apply({"params": params}, x, t, cond)
    y1 = m1.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)


def test_folded_conv_unfold_bwd_parity():
    """NOISEDIFF_UNFOLD_BWD routes folded SAME/stride-1 convs through a
    custom_vjp whose backward runs in the unfolded domain (the fold is a
    bitcast reshape in NHWC row-major, so the unfolded grads are exact).
    Forward and both gradients must match the folded-autodiff path."""
    from noisediff_tpu.models.blocks import _folded_conv_same

    rng = np.random.default_rng(0)
    fold, cin, cout = 2, 12, 20
    x = jnp.asarray(rng.normal(size=(2, 16, 12, cin * fold)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 16, 12, cout * fold)).astype(np.float32))

    def ref(xx, kk):
        kf = _fold_conv_kernel(kk, (cin,), fold)
        return jax.lax.conv_general_dilated(
            xx, kf, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    y1, vjp1 = jax.vjp(lambda xx, kk: _folded_conv_same(xx, kk, fold), x, k)
    y2, vjp2 = jax.vjp(ref, x, k)
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    (dx1, dk1), (dx2, dk2) = vjp1(g), vjp2(g)
    np.testing.assert_allclose(dx1, dx2, atol=1e-4)
    np.testing.assert_allclose(dk1, dk2, rtol=1e-5, atol=1e-3)


@pytest.mark.slow
def test_noisediffnet_unfold_bwd_grad_parity(monkeypatch):
    """Whole-model gradients with the flag on must match the flag-off path
    (both are exact gradients of the same function; tolerance is fp
    reassociation only)."""
    monkeypatch.setenv("NOISEDIFF_UNFOLD_BWD", "0")
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([5])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([3]),
    }
    m = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    params = m.init(jax.random.PRNGKey(3), x, t, cond)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x, t, cond) ** 2)

    g0 = jax.grad(loss)(params)
    monkeypatch.setenv("NOISEDIFF_UNFOLD_BWD", "1")
    g1 = jax.grad(loss)(params)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


def test_conv_same_taps_parity():
    """NOISEDIFF_TAPS_WGRAD routes SAME/stride-1 convs through a custom_vjp
    whose wgrad is one einsum per kernel tap (dgrad: transposed conv).
    Forward and both gradients must match autodiff, folded and unfolded,
    including the 1x1 (folded Dense) case."""
    from noisediff_tpu.models.blocks import _conv_same_taps

    rng = np.random.default_rng(0)
    for fold, ks, cin, cout in ((2, 3, 12, 20), (1, 3, 8, 8), (2, 1, 6, 10)):
        x = jnp.asarray(
            rng.normal(size=(2, 16, 12, cin * fold)).astype(np.float32)
        )
        k = jnp.asarray(rng.normal(size=(ks, ks, cin, cout)).astype(np.float32))
        g = jnp.asarray(
            rng.normal(size=(2, 16, 12, cout * fold)).astype(np.float32)
        )

        def ref(xx, kk):
            kf = _fold_conv_kernel(kk, (cin,), fold) if fold > 1 else kk
            return jax.lax.conv_general_dilated(
                xx, kf, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y1, vjp1 = jax.vjp(lambda xx, kk: _conv_same_taps(xx, kk, fold), x, k)
        y2, vjp2 = jax.vjp(ref, x, k)
        np.testing.assert_allclose(y1, y2, atol=1e-5)
        (dx1, dk1), (dx2, dk2) = vjp1(g), vjp2(g)
        np.testing.assert_allclose(dx1, dx2, atol=1e-4)
        np.testing.assert_allclose(dk1, dk2, rtol=1e-5, atol=1e-3)


@pytest.mark.slow
def test_noisediffnet_taps_wgrad_grad_parity(monkeypatch):
    """Whole-model gradients with NOISEDIFF_TAPS_WGRAD on must match the
    flag-off path (fp reassociation tolerance only). slow by pytest.ini's
    own definition: whole-model grad parity, ~215 s on a loaded box."""
    monkeypatch.setenv("NOISEDIFF_TAPS_WGRAD", "0")
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([5])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([3]),
    }
    m = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    params = m.init(jax.random.PRNGKey(3), x, t, cond)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x, t, cond) ** 2)

    g0 = jax.grad(loss)(params)
    monkeypatch.setenv("NOISEDIFF_TAPS_WGRAD", "1")
    g1 = jax.grad(loss)(params)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)
