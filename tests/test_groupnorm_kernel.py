"""Fused GroupNorm+FiLM+SiLU kernel tests (interpret mode on CPU) against the
jnp reference and against torch GroupNorm semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.ops.pallas.groupnorm_silu import (
    _reference,
    fits_vmem,
    fused_groupnorm_film_silu,
)


def _data(b=2, n=64, c=48, seed=0):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    x = jax.random.normal(k1, (b, n, c))
    gamma = jax.random.normal(k2, (c,)) * 0.1 + 1.0
    beta = jax.random.normal(k3, (c,)) * 0.1
    fs = jax.random.normal(k4, (b, c)) * 0.2
    fsh = jax.random.normal(k5, (b, c)) * 0.2
    return x, gamma, beta, fs, fsh


def test_kernel_matches_reference():
    x, gamma, beta, fs, fsh = _data()
    out = fused_groupnorm_film_silu(x, gamma, beta, fs, fsh, 8, 1e-5, True)
    ref = _reference(x, gamma, beta, fs, fsh, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_kernel_no_film():
    x, gamma, beta, _, _ = _data(seed=1)
    out = fused_groupnorm_film_silu(x, gamma, beta, None, None, 8, 1e-5, True)
    ref = _reference(x, gamma, beta, None, None, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_reference_matches_torch_groupnorm():
    torch = pytest.importorskip("torch")
    x, gamma, beta, _, _ = _data(b=1, n=16, c=16, seed=2)
    tx = torch.from_numpy(np.asarray(x)).reshape(1, 4, 4, 16).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(8, 16)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(gamma)))
        gn.bias.copy_(torch.from_numpy(np.asarray(beta)))
        t_out = torch.nn.functional.silu(gn(tx)).permute(0, 2, 3, 1).reshape(1, 16, 16)
    ref = _reference(x, gamma, beta, None, None, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(ref), t_out.numpy(), rtol=1e-4, atol=1e-5)


def test_kernel_gradients():
    x, gamma, beta, fs, fsh = _data(b=1, n=32, c=16, seed=3)

    def loss_fused(x, gamma, beta, fs, fsh):
        return (fused_groupnorm_film_silu(x, gamma, beta, fs, fsh, 8, 1e-5, True) ** 2).sum()

    def loss_ref(x, gamma, beta, fs, fsh):
        return (_reference(x, gamma, beta, fs, fsh, 8, 1e-5) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, fs, fsh)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, fs, fsh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fits_vmem():
    assert fits_vmem(128 * 128, 96)  # /2 stage at crop 256, fp32
    assert not fits_vmem(512 * 512, 48)  # full-res crop 512 fp32 doesn't
    assert fits_vmem(512 * 512, 48, itemsize=2) is False  # bf16 still 25 MB


def test_gn_stats_mxu_parity(monkeypatch):
    """The MXU-contraction GN stats (NOISEDIFF_GN_STATS=mxu, the TPU
    default) must match the plain fp32 reduce (=reduce) for value, input
    grad, and parameter grads — folded and unfolded, with FiLM. bf16
    multiplies are exact in the f32 accumulator, so only summation order
    differs (~1e-6 rel)."""
    import numpy as np
    from noisediff_tpu.models.blocks import GroupNorm

    rng = np.random.default_rng(1)
    for fold, cf in ((1, 32), (2, 64)):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, cf)).astype(np.float32)) * 3 + 1
        ss = (
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
        )
        m = GroupNorm(groups=8, fold=fold)
        p = m.init(jax.random.PRNGKey(0), x, ss)
        p = jax.tree.map(lambda t: t + 0.3, p)

        def loss(pp, xx):
            y = m.apply(pp, xx, ss)
            return jnp.sum(jnp.sin(y) * y)

        outs = {}
        for flag in ("reduce", "mxu", "pallas-interpret"):
            monkeypatch.setenv("NOISEDIFF_GN_STATS", flag)
            v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
            outs[flag] = (v, gp, gx)
        v0, gp0, gx0 = outs["reduce"]
        for other in ("mxu", "pallas-interpret"):
            v1, gp1, gx1 = outs[other]
            np.testing.assert_allclose(v0, v1, rtol=1e-5)
            np.testing.assert_allclose(gx0, gx1, rtol=1e-4, atol=1e-5)
            for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_gn_pallas_gate_is_train_context_only(monkeypatch):
    """The streaming GN kernels are a train win and a measured ~6.5%/eval
    GENERATION loss (round-3 verdict Weak #1), so the default gate must
    require the trace-time training context (train/state.py sets it);
    sampler/eval traces never enable the kernel. Env flags keep their
    force/opt-out semantics regardless of context."""
    from noisediff_tpu.models import blocks

    monkeypatch.setattr(blocks.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("NOISEDIFF_GN_STATS", raising=False)
    big = jnp.zeros((2, 128, 64, 32))
    small = jnp.zeros((2, 16, 16, 32))
    assert blocks._gn_stats_pallas_mode(big) == ""  # eval trace: off
    with blocks.gn_train_trace():
        assert blocks._gn_stats_pallas_mode(big) == "tpu"
        assert blocks._gn_stats_pallas_mode(small) == ""  # size gate holds
        with blocks.gn_train_trace():  # re-entrant
            assert blocks._gn_stats_pallas_mode(big) == "tpu"
        assert blocks._gn_stats_pallas_mode(big) == "tpu"
    assert blocks._gn_stats_pallas_mode(big) == ""  # context restored
    monkeypatch.setenv("NOISEDIFF_GN_STATS", "pallas")  # explicit force
    assert blocks._gn_stats_pallas_mode(big) == "tpu"
    monkeypatch.setenv("NOISEDIFF_GN_STATS", "reduce")  # opt-out wins
    with blocks.gn_train_trace():
        assert blocks._gn_stats_pallas_mode(big) == ""
    monkeypatch.setenv("NOISEDIFF_GN_STATS", "pallas-interpret")
    assert blocks._gn_stats_pallas_mode(big) == "interpret"


def test_gn_stats_pallas_kernel_and_vjp(monkeypatch):
    """Direct kernel check (interpret mode): gn_stats matches the fp32
    reduce, and gn_stats_vjp's closed-form backward matches autodiff of
    the reduce (the NOISEDIFF_GN_BWD=xla + pallas-stats combination)."""
    import numpy as np
    from noisediff_tpu.ops.pallas.gn_stats import gn_stats, gn_stats_vjp

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 32)).astype(np.float32)) * 2 + 1
    s, q = gn_stats(x, interpret=True)
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(s, xf.sum(axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(q, (xf * xf).sum(axis=(1, 2)), rtol=1e-6)

    def loss_k(xx):
        s, q = gn_stats_vjp(xx, True)
        return jnp.sum(jnp.sin(s) * q)

    def loss_r(xx):
        xf = xx.astype(jnp.float32)
        s, q = xf.sum(axis=(1, 2)), (xf * xf).sum(axis=(1, 2))
        return jnp.sum(jnp.sin(s) * q)

    gk = jax.grad(loss_k)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(gk, gr, rtol=1e-4, atol=1e-4)


def test_gn_grad_stats_kernel():
    """Direct check of the backward grad-stats kernel (interpret mode):
    gn_grad_stats(g, x) == (sum_hw g, sum_hw g*x) in fp32."""
    import numpy as np
    from noisediff_tpu.ops.pallas.gn_stats import gn_grad_stats

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=(2, 8, 12, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 32)).astype(np.float32)) * 2 + 1
    s, p = gn_grad_stats(g, x, interpret=True)
    np.testing.assert_allclose(s, np.asarray(g).sum(axis=(1, 2)), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(
        p, (np.asarray(g) * np.asarray(x)).sum(axis=(1, 2)), rtol=1e-5,
        atol=1e-5)


def test_gn_apply_pallas_backward_parity(monkeypatch):
    """The Pallas-streamed affine-application backward (_gn_apply, active
    whenever the stats kernel is) must match the plain-XLA application
    backward for value, input grad, and parameter grads — folded and
    unfolded, with FiLM. NOISEDIFF_GN_STATS=pallas-interpret activates
    both kernels; NOISEDIFF_GN_APPLY_BWD=xla isolates the apply leg."""
    import numpy as np
    from noisediff_tpu.models.blocks import GroupNorm

    rng = np.random.default_rng(7)
    for fold, cf in ((1, 32), (2, 64)):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, cf)).astype(np.float32)) * 3 + 1
        ss = (
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
        )
        m = GroupNorm(groups=8, fold=fold)
        p = m.init(jax.random.PRNGKey(0), x, ss)
        p = jax.tree.map(lambda t: t + 0.3, p)

        def loss(pp, xx):
            y = m.apply(pp, xx, ss)
            return jnp.sum(jnp.sin(y) * y)

        outs = {}
        for mode in ("reduce", "pallas-xla-apply", "pallas"):
            monkeypatch.setenv(
                "NOISEDIFF_GN_STATS",
                "reduce" if mode == "reduce" else "pallas-interpret")
            monkeypatch.setenv(
                "NOISEDIFF_GN_APPLY_BWD",
                "xla" if mode == "pallas-xla-apply" else "")
            outs[mode] = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        v0, (gp0, gx0) = outs["reduce"]
        for mode in ("pallas-xla-apply", "pallas"):
            v1, (gp1, gx1) = outs[mode]
            np.testing.assert_allclose(v0, v1, rtol=1e-6)
            np.testing.assert_allclose(gx0, gx1, rtol=1e-4, atol=1e-5)
            for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_gn_grad_stats_partitioned_on_mesh(monkeypatch):
    """The backward grad-stats kernel must stay sharded under pjit: direct
    gn_grad_stats_p parity on a (data, spatial) mesh, plus a whole-module
    grad with the Pallas apply-backward active on sharded inputs."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from noisediff_tpu.ops.pallas.gn_stats import gn_grad_stats_p
    from noisediff_tpu.models.blocks import GroupNorm

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "spatial"))
    rng = np.random.default_rng(11)
    g = jnp.asarray(rng.normal(size=(4, 8, 12, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 8, 12, 32)).astype(np.float32))
    gf, xf = np.asarray(g, np.float32), np.asarray(x, np.float32)

    for spec in (P("data", "spatial"), P("data", None, "spatial")):
        sh = NamedSharding(mesh, spec)
        gs, xs = jax.device_put(g, sh), jax.device_put(x, sh)
        with jax.set_mesh(mesh):
            s, p = jax.jit(lambda a, b: gn_grad_stats_p(a, b, True))(gs, xs)
        np.testing.assert_allclose(s, gf.sum(axis=(1, 2)), rtol=1e-4,
                                   atol=5e-3)
        np.testing.assert_allclose(p, (gf * xf).sum(axis=(1, 2)), rtol=1e-4,
                                   atol=5e-3)

    m = GroupNorm(groups=8, fold=1)
    pm = m.init(jax.random.PRNGKey(0), x)

    def loss(pp, xx):
        return jnp.sum(jnp.sin(m.apply(pp, xx)))

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    outs = {}
    for flag in ("reduce", "pallas-interpret"):
        monkeypatch.setenv("NOISEDIFF_GN_STATS", flag)
        with jax.set_mesh(mesh):
            outs[flag] = jax.jit(jax.grad(loss, argnums=(0, 1)))(pm, xs)
    for a, b in zip(jax.tree.leaves(outs["reduce"]),
                    jax.tree.leaves(outs["pallas-interpret"])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_gn_analytic_backward_parity(monkeypatch):
    """The analytic GroupNorm-stats backward (_gn_coeffs custom_vjp, the
    default) must match plain autodiff (NOISEDIFF_GN_BWD=xla) for value,
    input grad, and parameter grads — folded and unfolded, with FiLM."""
    import numpy as np
    from noisediff_tpu.models.blocks import GroupNorm

    rng = np.random.default_rng(0)
    for fold, cf in ((1, 32), (2, 64)):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, cf)).astype(np.float32)) * 3 + 1
        ss = (
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 1, 1, cf)).astype(np.float32)),
        )
        m = GroupNorm(groups=8, fold=fold)
        p = m.init(jax.random.PRNGKey(0), x, ss)
        p = jax.tree.map(lambda t: t + 0.3, p)

        def loss(pp, xx):
            y = m.apply(pp, xx, ss)
            return jnp.sum(jnp.sin(y) * y)

        outs = {}
        for flag in ("xla", ""):
            monkeypatch.setenv("NOISEDIFF_GN_BWD", flag)
            v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
            outs[flag] = (v, gp, gx)
        v0, gp0, gx0 = outs["xla"]
        v1, gp1, gx1 = outs[""]
        np.testing.assert_allclose(v0, v1, rtol=1e-6)
        np.testing.assert_allclose(gx0, gx1, rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_gn_stats_partitioned_on_mesh(monkeypatch):
    """The custom_partitioning wrapper (gn_stats_p) must compute the same
    per-(batch, channel) sums when the activation is sharded over a
    (data, spatial) mesh — each shard streams only its local tile through
    the kernel, then psums over whichever mesh axes shard H/W. Covers
    H-sharding, W-sharding (the width-folded layout shards W), and the
    GroupNorm module end-to-end under pjit."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from noisediff_tpu.ops.pallas.gn_stats import gn_stats_p
    from noisediff_tpu.models.blocks import GroupNorm

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "spatial"))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 12, 32)).astype(np.float32))
    xf = np.asarray(x, np.float32)

    for spec in (P("data", "spatial"), P("data", None, "spatial"), P("data")):
        xs = jax.device_put(x, NamedSharding(mesh, spec))
        with jax.set_mesh(mesh):
            s, q = jax.jit(lambda a: gn_stats_p(a, True))(xs)
        # per-shard partial sums + psum reassociate the fp32 summation;
        # near-zero sums of ~100 N(0,1) values inflate the relative error
        np.testing.assert_allclose(s, xf.sum(axis=(1, 2)), rtol=1e-4, atol=5e-3)
        np.testing.assert_allclose(
            q, (xf * xf).sum(axis=(1, 2)), rtol=1e-4, atol=5e-3
        )

    # whole-module parity under pjit: pallas-partitioned vs plain reduce
    ss = (
        jnp.asarray(rng.normal(size=(4, 1, 1, 32)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 1, 1, 32)).astype(np.float32)),
    )
    m = GroupNorm(groups=8, fold=1)
    p = m.init(jax.random.PRNGKey(0), x, ss)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    outs = {}
    for flag in ("reduce", "pallas-interpret"):
        monkeypatch.setenv("NOISEDIFF_GN_STATS", flag)
        with jax.set_mesh(mesh):
            outs[flag] = jax.jit(lambda pp, aa: m.apply(pp, aa, ss))(p, xs)
    np.testing.assert_allclose(
        outs["reduce"], outs["pallas-interpret"], rtol=1e-5, atol=1e-6
    )


def test_gn_dispatch_gates_on_active_mesh():
    """The SPMD dispatch must route through custom_partitioning only when
    the CURRENT trace has an active >1-device mesh (jax.set_mesh), not
    whenever the process happens to see multiple devices — a deliberately
    single-device jit on this 8-device CPU process takes the plain kernel
    (round-3/4 advisor item). A pjit whose mesh arrives only through
    in_shardings is invisible at trace time (pinned here), which is why
    trainers/dryrun/fullframe wrap their traced calls in
    parallel.mesh.activate()."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from noisediff_tpu.ops.pallas import gn_stats as gs
    from noisediff_tpu.parallel.mesh import activate

    assert jax.device_count() >= 8  # the premise of the test

    seen = []

    def probe(x):
        seen.append(gs._mesh_devices())
        return x * 2

    # single-device jit on a multi-device process: no active mesh
    jax.jit(probe)(jnp.ones((4, 4)))
    assert seen.pop() == 1

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "spatial"))
    xs = jax.device_put(jnp.ones((8, 4)), NamedSharding(mesh, P("data")))

    # mesh via in_shardings ONLY: invisible at trace time (the documented
    # pjit gap that activate() exists to close)
    jax.jit(probe, in_shardings=NamedSharding(mesh, P("data")))(xs)
    assert seen.pop() == 1

    # activate(mesh) == jax.set_mesh for >1-device meshes: visible
    with activate(mesh):
        jax.jit(lambda a: probe(a) + 0)(xs)
    assert seen.pop() == mesh.size

    # activate() on a 1-device mesh is a no-op
    m1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("data",))
    with activate(m1):
        jax.jit(lambda a: probe(a) + 1)(jnp.ones((4, 4)))
    assert seen.pop() == 1
