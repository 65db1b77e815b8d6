"""Fused AttnBlock-tail Pallas kernel: numerics vs the jnp reference and vs
the real AttnBlock module (XLA path), plus gradient flow through the
custom_vjp recompute."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models.blocks import AttnBlock, fold_width
from noisediff_tpu.ops.pallas.attn_tail import (
    fused_attn_tail,
    reference_attn_tail,
)


def _params(key, c, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    return dict(
        ln_scale=jax.random.uniform(ks[0], (c,), jnp.float32, 0.5, 1.5),
        ln_bias=jax.random.normal(ks[1], (c,), jnp.float32) * 0.1,
        w1=jax.random.normal(ks[2], (c, 2 * c), jnp.float32) / np.sqrt(c),
        b1=jax.random.normal(ks[3], (2 * c,), jnp.float32) * 0.1,
        w2=jax.random.normal(ks[4], (2 * c, c), jnp.float32) / np.sqrt(2 * c),
        b2=jax.random.normal(ks[5], (c,), jnp.float32) * 0.1,
        wp=jax.random.normal(ks[6], (c, c), jnp.float32) / np.sqrt(c),
        bp=jax.random.normal(ks[7], (c,), jnp.float32) * 0.1,
    )


@pytest.mark.parametrize("fold", [1, 2])
@pytest.mark.parametrize("dtype,rtol,atol", [(jnp.float32, 2e-5, 2e-5),
                                             (jnp.bfloat16, 3e-2, 3e-2)])
def test_kernel_matches_reference(fold, dtype, rtol, atol):
    b, h, w, c = 2, 8, 16, 12
    cf = fold * c
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cf)).astype(dtype)
    tok = (jax.random.normal(jax.random.PRNGKey(1), (b, cf)) * 0.3).astype(dtype)
    p = _params(2, c)
    args = (x, tok, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
            p["b2"], p["wp"], p["bp"])
    got = fused_attn_tail(*args, fold, 1e-5, True)  # interpret mode
    want = reference_attn_tail(*args, fold=fold)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        got.astype(jnp.float32), want.astype(jnp.float32), rtol=rtol, atol=atol
    )


@pytest.mark.parametrize("fold", [1, 2])
def test_attnblock_fused_matches_xla(fold, monkeypatch):
    """The module with the fused path produces the XLA path's output and the
    identical parameter tree."""
    b, h, w, c = 2, 8, 8, 12
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, c))
    if fold > 1:
        x = fold_width(x, fold)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (b, 1, 16))
    blk = AttnBlock(heads=2, dim_head=8, fold=fold)

    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN", "0")
    params = blk.init(jax.random.PRNGKey(5), x, ctx)["params"]
    y_xla = blk.apply({"params": params}, x, ctx)

    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN", "interpret")
    params_fused = blk.init(jax.random.PRNGKey(5), x, ctx)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)
    for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(params_fused)):
        np.testing.assert_array_equal(a, bb)  # identical init via paths
    y_fused = blk.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(y_fused, y_xla, rtol=5e-5, atol=5e-5)


def test_fused_grad_flows(monkeypatch):
    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN", "interpret")
    b, h, w, c = 1, 8, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(6), (b, h, w, c))
    ctx = jax.random.normal(jax.random.PRNGKey(7), (b, 1, 16))
    blk = AttnBlock(heads=2, dim_head=8)
    params = blk.init(jax.random.PRNGKey(8), x, ctx)["params"]

    def loss(p, x):
        return (blk.apply({"params": p}, x, ctx) ** 2).sum()

    g = jax.grad(loss)(params, x)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(v).all() for v in leaves)
    # the fused path must still produce gradients for LN2/FF/proj params
    assert any(float(np.abs(v).sum()) > 0 for v in leaves)


@pytest.mark.slow
def test_noisediffnet_fused_paths_match(monkeypatch):
    """Whole-model parity: fused attn-tail + dual-head kernels (interpret)
    vs the XLA paths, same params, identical param tree."""
    from noisediff_tpu.models import NoiseDiffNet

    b, s = 1, 16
    model = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([3])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([5]),
    }
    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN", "0")
    params = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    y_xla = model.apply({"params": params}, x, t, cond)

    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN", "interpret")
    monkeypatch.setenv("NOISEDIFF_FUSED_HEADS", "interpret")
    params_f = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(params_f)):
        np.testing.assert_array_equal(a, bb)
    y_fused = model.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(y_fused, y_xla, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_packed_heads_flag_is_exact(monkeypatch):
    """NOISEDIFF_PACKED_HEADS=1 (packed strided-conv dual heads,
    blocks.packed_narrow_conv) matches the default XLA heads with the same
    params to contraction-reassociation precision (~1e-7 fp32)."""
    from noisediff_tpu.models import NoiseDiffNet

    b, s = 2, 16
    model = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([3, 9])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([5, 1]),
    }
    monkeypatch.delenv("NOISEDIFF_PACKED_HEADS", raising=False)
    params = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    y0 = model.apply({"params": params}, x, t, cond)
    monkeypatch.setenv("NOISEDIFF_PACKED_HEADS", "1")
    params_p = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    y1 = model.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=0, atol=1e-5
    )


@pytest.mark.slow
def test_packed_head_posemb_family_is_exact(monkeypatch):
    """The PosEmbUNet final_conv packed head matches the default path.
    slow: two whole-model UNet_PosEmbV2 inits+forwards (~59 s loaded)."""
    from noisediff_tpu.models.others import UNet_PosEmbV2

    model = UNet_PosEmbV2(dim=8).clone(lane_fold=True, pos_dim=4)
    b, s = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([3])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([5]),
    }
    monkeypatch.delenv("NOISEDIFF_PACKED_HEADS", raising=False)
    params = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    y0 = model.apply({"params": params}, x, t, cond)
    monkeypatch.setenv("NOISEDIFF_PACKED_HEADS", "1")
    params_p = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    y1 = model.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=0, atol=1e-5
    )


@pytest.mark.slow
def test_fused_heads_flag_falls_back_off_tpu(monkeypatch):
    """NOISEDIFF_FUSED_HEADS=1 on a non-TPU backend must take the XLA path
    (identical output), not invoke Mosaic (review regression guard)."""
    from noisediff_tpu.models import NoiseDiffNet

    b, s = 1, 16
    model = NoiseDiffNet(dim=8, pos_dim=4, lane_fold=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
    t = jnp.array([2])
    cond = {
        "clean_img": jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 4)),
        "position": jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 2)),
        "iso_ratio_idx": jnp.array([7]),
    }
    monkeypatch.delenv("NOISEDIFF_FUSED_HEADS", raising=False)
    params = model.init(jax.random.PRNGKey(3), x, t, cond)["params"]
    y0 = model.apply({"params": params}, x, t, cond)
    monkeypatch.setenv("NOISEDIFF_FUSED_HEADS", "1")
    y1 = model.apply({"params": params}, x, t, cond)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


@pytest.mark.parametrize("fold", [1, 2])
@pytest.mark.parametrize("dtype,rtol,atol", [(jnp.float32, 5e-4, 5e-4),
                                             (jnp.bfloat16, 5e-2, 5e-2)])
def test_pallas_backward_matches_reference_grads(fold, dtype, rtol, atol):
    """The Pallas backward kernel (tile recompute + in-kernel vjp) must match
    jax.grad of the jnp reference for every input and parameter."""
    b, h, w, c = 2, 8, 16, 12
    cf = fold * c
    x = jax.random.normal(jax.random.PRNGKey(10), (b, h, w, cf)).astype(dtype)
    tok = (jax.random.normal(jax.random.PRNGKey(11), (b, cf)) * 0.3).astype(dtype)
    p = _params(12, c)
    args = (x, tok, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
            p["b2"], p["wp"], p["bp"])
    cot = jax.random.normal(jax.random.PRNGKey(13), (b, h, w, cf)).astype(dtype)

    def loss_fused(*a):
        return (fused_attn_tail(*a, fold, 1e-5, True).astype(jnp.float32)
                * cot.astype(jnp.float32)).sum()

    def loss_ref(*a):
        return (reference_attn_tail(*a, fold=fold).astype(jnp.float32)
                * cot.astype(jnp.float32)).sum()

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = ["x", "tok", "ln_scale", "ln_bias", "w1", "b1", "w2", "b2",
             "wp", "bp"]
    for name, gg, ww in zip(names, got, want):
        assert gg.shape == ww.shape and gg.dtype == ww.dtype, name
        scale = max(1.0, float(jnp.abs(ww.astype(jnp.float32)).max()))
        np.testing.assert_allclose(
            np.asarray(gg, np.float32) / scale, np.asarray(ww, np.float32) / scale,
            rtol=rtol, atol=atol, err_msg=name,
        )


def test_pallas_backward_xla_flag_fallback(monkeypatch):
    """NOISEDIFF_FUSED_ATTN_BWD=xla routes to the jnp-recompute backward."""
    monkeypatch.setenv("NOISEDIFF_FUSED_ATTN_BWD", "xla")
    b, h, w, c = 1, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(20), (b, h, w, c))
    tok = jax.random.normal(jax.random.PRNGKey(21), (b, c)) * 0.3
    p = _params(22, c)
    args = (x, tok, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
            p["b2"], p["wp"], p["bp"])

    def loss(*a):
        return fused_attn_tail(*a, 1, 1e-5, True).sum()

    def loss_ref(*a):
        return reference_attn_tail(*a, fold=1).sum()

    got = jax.grad(loss, argnums=(0, 4))(*args)
    want = jax.grad(loss_ref, argnums=(0, 4))(*args)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(gg, ww, rtol=1e-5, atol=1e-5)
