"""Streaming Pallas conv-wgrad kernel tests (interpret mode on CPU).

The kernel (ops/pallas/conv_wgrad.py) replaces XLA's wgrad-as-convolution
lowering for stride-1 SAME convs in the train graph; forward and dgrad stay
XLA's. Parity targets: the direct tap-sum definition, and whole-op
value+grad vs plain autodiff of the same conv — folded and unfolded,
including concat-part inputs (the final_res_block shape family)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.models.blocks import (
    Conv,
    _conv_same_pallas_wgrad,
    _fold_conv_kernel,
    fold_width,
)
from noisediff_tpu.ops.pallas.conv_wgrad import conv_wgrad


def _ref_wgrad(g, x, kh, kwf):
    """Direct definition: dkf[i,j,ci,co] = sum x[h+i-pl, w+j-pl] g[h, w]."""
    b, h, w, ci = x.shape
    co = g.shape[-1]
    pl_h, pl_w = (kh - 1) // 2, (kwf - 1) // 2
    xp = np.zeros((b, h + kh - 1, w + kwf - 1, ci), np.float32)
    xp[:, pl_h : pl_h + h, pl_w : pl_w + w] = np.asarray(x, np.float32)
    gf = np.asarray(g, np.float32)
    out = np.zeros((kh, kwf, ci, co), np.float32)
    for i in range(kh):
        for j in range(kwf):
            xs = xp[:, i : i + h, j : j + w]
            out[i, j] = np.einsum("bhwi,bhwo->io", xs, gf)
    return out


@pytest.mark.parametrize("kh,kwf", [(3, 3), (3, 2), (1, 1), (3, 1), (1, 2)])
def test_conv_wgrad_kernel_matches_tap_sum(kh, kwf):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 8, 12, 24)).astype(np.float32))
    out = conv_wgrad(g, x, kh, kwf, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref_wgrad(g, x, kh, kwf), rtol=1e-5, atol=1e-4
    )


def test_conv_wgrad_kernel_single_row_blocks():
    """Degenerate tiling (R == 1 after the budget) still carries rows."""
    from noisediff_tpu.ops.pallas import conv_wgrad as m

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 6, 4, 8)).astype(np.float32))
    orig = m._tile_rows
    try:
        m._tile_rows = lambda *a, **k: 1
        out = conv_wgrad(g, x, 3, 3, interpret=True)
    finally:
        m._tile_rows = orig
    np.testing.assert_allclose(
        np.asarray(out), _ref_wgrad(g, x, 3, 3), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("fold,ks", [(1, 3), (2, 3), (2, 1), (4, 3)])
def test_conv_same_pallas_wgrad_grad_parity(fold, ks):
    """value, dx, and dkernel must match plain autodiff of the same conv
    (fp32 data, so the only difference is summation order)."""
    rng = np.random.default_rng(2)
    ci, co = 8, 12
    xu = jnp.asarray(rng.normal(size=(2, 8, 16, ci)).astype(np.float32))
    x = fold_width(xu, fold) if fold > 1 else xu
    kernel = jnp.asarray(
        rng.normal(size=(ks, ks, ci, co)).astype(np.float32) * 0.2
    )

    def loss_pallas(xx, kk):
        y = _conv_same_pallas_wgrad(xx, kk, fold, "interpret")
        return jnp.sum(jnp.sin(y) * y)

    def loss_plain(xx, kk):
        kf = _fold_conv_kernel(kk, (ci,), fold) if fold > 1 else kk
        y = jax.lax.conv_general_dilated(
            xx, kf.astype(xx.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y) * y)

    v1, (dx1, dk1) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, kernel)
    v2, (dx2, dk2) = jax.value_and_grad(loss_plain, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_allclose(dx1, dx2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dk1, dk2, rtol=1e-4, atol=1e-4)


def test_conv_module_routes_and_matches(monkeypatch):
    """Conv with NOISEDIFF_WGRAD=pallas-interpret: same params, same value,
    same grads as the default XLA path — including a concat (tuple) input
    like final_res_block's skip join."""
    rng = np.random.default_rng(3)
    fold = 2
    a = jnp.asarray(rng.normal(size=(1, 8, 8, 2 * 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 8, 8, 2 * 10)).astype(np.float32))
    m = Conv(12, 3, fold=fold)
    p = m.init(jax.random.PRNGKey(0), (a, b))

    def loss(pp, xa, xb):
        return jnp.sum(jnp.cos(m.apply(pp, (xa, xb))))

    outs = {}
    for flag in ("xla", "pallas-interpret"):
        monkeypatch.setenv("NOISEDIFF_WGRAD", flag)
        outs[flag] = jax.value_and_grad(loss, argnums=(0, 1, 2))(p, a, b)
    (v0, g0), (v1, g1) = outs["xla"], outs["pallas-interpret"]
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    for t0, t1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(t0, t1, rtol=1e-4, atol=1e-4)


def test_conv_wgrad_partitioned_on_mesh(monkeypatch):
    """conv_wgrad_p under pjit on a data-sharded mesh: each shard streams
    its local batch tile; the psum over the data axis IS the early DDP
    gradient all-reduce. Whole-op grads must match the single-device
    kernel; spatially-sharded activations must be rejected loudly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from noisediff_tpu.ops.pallas.conv_wgrad import conv_wgrad_p

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "spatial"))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, 12, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 8, 12, 8)).astype(np.float32))
    sh = NamedSharding(mesh, P("data"))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda a, b: conv_wgrad_p(a, b, 3, 3, True))(
            jax.device_put(g, sh), jax.device_put(x, sh)
        )
    np.testing.assert_allclose(
        np.asarray(out), _ref_wgrad(g, x, 3, 3), rtol=1e-4, atol=1e-3
    )

    with pytest.raises(Exception, match="spatially-sharded"):
        sh2 = NamedSharding(mesh, P("data", "spatial"))
        with jax.set_mesh(mesh):
            jax.jit(lambda a, b: conv_wgrad_p(a, b, 3, 3, True))(
                jax.device_put(g, sh2), jax.device_put(x, sh2)
            ).block_until_ready()


def test_dense_folded_4d_routes_and_matches(monkeypatch):
    """The folded Dense 4-D path (1x1-conv lowering) routes through the
    Pallas wgrad too; value and grads match the default path."""
    from noisediff_tpu.models.blocks import Dense

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2 * 12)).astype(np.float32))
    m = Dense(10, fold=2)
    p = m.init(jax.random.PRNGKey(0), x)

    def loss(pp, xx):
        return jnp.sum(jnp.sin(m.apply(pp, xx)))

    outs = {}
    for flag in ("xla", "pallas-interpret"):
        monkeypatch.setenv("NOISEDIFF_WGRAD", flag)
        outs[flag] = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    (v0, g0), (v1, g1) = outs["xla"], outs["pallas-interpret"]
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    for t0, t1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(t0, t1, rtol=1e-4, atol=1e-4)


def test_wgrad_gate_is_train_context_only(monkeypatch):
    """NOISEDIFF_WGRAD=auto: the Pallas wgrad only activates inside a
    training trace on TPU at generation-scale activations — mirroring the
    GN kernels' round-4 gate. Unset/xla keeps XLA's lowering."""
    from noisediff_tpu.models import blocks

    monkeypatch.setattr(blocks.jax, "default_backend", lambda: "tpu")
    big = jnp.zeros((2, 128, 64, 32))
    monkeypatch.delenv("NOISEDIFF_WGRAD", raising=False)
    with blocks.gn_train_trace():
        assert blocks._wgrad_pallas_mode(big) == ""  # opt-in for now
    monkeypatch.setenv("NOISEDIFF_WGRAD", "auto")
    assert blocks._wgrad_pallas_mode(big) == ""  # eval trace: off
    with blocks.gn_train_trace():
        assert blocks._wgrad_pallas_mode(big) == "tpu"
        assert blocks._wgrad_pallas_mode(jnp.zeros((2, 16, 16, 32))) == ""
    monkeypatch.setenv("NOISEDIFF_WGRAD", "xla")
    with blocks.gn_train_trace():
        assert blocks._wgrad_pallas_mode(big) == ""
    monkeypatch.setenv("NOISEDIFF_WGRAD", "pallas")
    assert blocks._wgrad_pallas_mode(big) == "tpu"
    # =pallas is an unconditional force: no area floor (round-4 advisor —
    # the min_hw gate only shapes 'auto', so forced A/Bs measure what
    # they say they measure)
    assert blocks._wgrad_pallas_mode(jnp.zeros((2, 16, 16, 32))) == "tpu"
