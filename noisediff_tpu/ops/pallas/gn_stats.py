"""Streaming GroupNorm-stats Pallas kernel.

The crop-512 train graph computes the per-(batch, channel) GroupNorm
stats (s = sum_hw x, q = sum_hw x^2) as dedicated XLA reduce fusions
over conv outputs pinned to batch-in-sublanes layouts; ten such fusions
measure ~1.25 ms each — ~37 GB/s effective for a 50 MB read (the
"AllBatchInSubla" reduce emitter). This kernel streams the activation at
Mosaic DMA rates (~540 GB/s measured on this runtime, BENCH_NOTES) and
accumulates fp32 sums in VMEM across the sequential grid.

Layout contract (the attn_tail trick): the activation is fed
(H, W, B, C)-transposed so the custom call's default descending layout
is PHYSICALLY the conv emitters' preferred {3,0,2,1} batch-in-sublanes
layout of the original (B, H, W, C) tensor — the surrounding transpose
is a layout bitcast, not a layout pin that would de-optimise the
neighbouring convolutions.

Stats semantics match models/blocks._gn_coeffs_primal (torch GroupNorm
fp32 stats — reference models/Diffusion_arch.py block norms): fp32
accumulation, uncentered sums; only the summation order differs from
the XLA reduce (~1e-6 rel for bf16 inputs).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

# bf16 block elements per grid step (~2 MB bf16 + fp32 temporaries)
TILE_ELEM_LIMIT = 1024 * 1024


def _tile_rows(h: int, wb: int, cf: int,
               limit_elems: int = TILE_ELEM_LIMIT) -> int:
    """Largest row count R dividing h with R*wb*cf elements within budget."""
    limit = max(1, min(limit_elems // max(wb * cf, 1), h))
    for r in range(limit, 0, -1):
        if h % r == 0:
            return r
    return 1


def _kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)
    r, w, b, cf = x_ref.shape
    x = x_ref[...].astype(jnp.float32).reshape(r * w, b, cf)
    s = jnp.sum(x, axis=0)
    q = jnp.sum(x * x, axis=0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = s
        q_ref[...] = q

    @pl.when(i != 0)
    def _acc():
        s_ref[...] += s
        q_ref[...] += q


def gn_stats(x, interpret: bool = False):
    """(B, H, W, CF) activation -> (s, q) fp32 (B, CF) per-channel sums."""
    b, h, w, cf = x.shape
    r = _tile_rows(h, w * b, cf)
    xt = jnp.transpose(x, (1, 2, 0, 3))  # (H, W, B, C): a layout bitcast
    s, q = pl.pallas_call(
        _kernel,
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cf), jnp.float32),
            jax.ShapeDtypeStruct((b, cf), jnp.float32),
        ],
        interpret=interpret,
    )(xt)
    return s, q


def _axes_of(dim_spec):
    """Mesh axis names a PartitionSpec entry shards over ('' / str / tuple)."""
    if dim_spec is None:
        return ()
    if isinstance(dim_spec, str):
        return (dim_spec,)
    return tuple(dim_spec)


def _spec4(sharding):
    """A NamedSharding's PartitionSpec padded to the kernel's rank 4.

    Shared by the infer and partition rules of BOTH kernels so the two
    stay in lockstep (round-3 advisor: the hand-rolled [None]*4 vs
    pad-to-rank idioms invited drift)."""
    return (list(sharding.spec) + [None] * 4)[:4]


def _stats_rules(kernel):
    """(infer_sharding, partition) pair for a streaming stats kernel of
    signature kernel(*operands, interpret) -> two (b, c) fp32 sums.

    Dataflow: b and c pass through, h and w are reduction factors — each
    shard streams its local tile, then a psum runs over whichever mesh
    axes shard the spatial dims (none under pure data parallelism). For
    the two-operand kernel the operands must agree on one layout; the
    rule picks the MORE-SHARDED operand's spec (slicing a replicated
    operand to match is free, while forcing a sharded activation to a
    replicated spec would all-gather it — round-3 advisor note on
    _grad_partition) and ties go to the first operand (the cotangent)."""

    def pick_spec(arg_shapes):
        shardings = [a.sharding for a in arg_shapes]
        return max(
            shardings,
            key=lambda sh: sum(bool(_axes_of(d)) for d in _spec4(sh)),
        )

    def infer(interpret, mesh, arg_shapes, result_shape):
        spec = _spec4(pick_spec(arg_shapes))
        out = NamedSharding(mesh, P(spec[0], spec[3]))
        return (out, out)

    def partition(interpret, mesh, arg_shapes, result_shape):
        arg_sh = pick_spec(arg_shapes)
        spec = _spec4(arg_sh)
        reduce_axes = _axes_of(spec[1]) + _axes_of(spec[2])
        out = NamedSharding(mesh, P(spec[0], spec[3]))

        def lower(*operands):
            s, q = kernel(*operands, interpret)
            if reduce_axes:
                s = jax.lax.psum(s, reduce_axes)
                q = jax.lax.psum(q, reduce_axes)
            return s, q

        return mesh, lower, (out, out), (arg_sh,) * len(arg_shapes)

    return infer, partition


@functools.partial(custom_partitioning, static_argnums=(1,))
def gn_stats_p(x, interpret: bool = False):
    """gn_stats with an SPMD partition rule so the kernel survives pjit.

    Without this, a pallas_call inside a jit over a >1-device mesh is an
    opaque custom call: the partitioner replicates the (possibly huge)
    activation onto every chip. The rule below declares the true
    dataflow — b and c pass through, h and w are reduction factors — so
    each shard streams only its local tile through the kernel, followed
    by a psum over whichever mesh axes shard the spatial dims (none under
    pure data parallelism: GN stats are per-sample). Multi-chip training
    therefore keeps the kernel's +12.6% step-time win (BENCH_NOTES
    round-3) instead of falling back to the lane-hostile XLA reduces.
    """
    return gn_stats(x, interpret)


_infer_sharding, _partition = _stats_rules(gn_stats)

gn_stats_p.def_partition(
    _partition,
    infer_sharding_from_operands=_infer_sharding,
    sharding_rule="b h w c -> b c, b c",
    reduction_factors=("h", "w"),
)


def _mesh_devices() -> int:
    """Size of the mesh the CURRENT trace targets, 1 when none is active.

    Trace-time signal (round-3/4 advisor fix: gate on an *active mesh*,
    not the global device count, so deliberately single-device jits on a
    multi-device process skip custom_partitioning). A pjit whose mesh
    arrives only through in_shardings is invisible here (measured: both
    the abstract and physical mesh are empty inside such traces), so
    multi-device callsites activate their mesh with `jax.set_mesh(mesh)`
    around the traced call — as the trainers, dryrun, and the 8-device
    parity tests do."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty:
            return am.size
    except Exception:
        pass
    try:
        from jax._src.mesh import thread_resources

        pm = thread_resources.env.physical_mesh
        if not pm.empty:
            return pm.size
    except Exception:
        pass
    return 1


def _dispatch(x, interpret: bool):
    # Route through custom_partitioning only when the current trace has an
    # active >1-device mesh (jax.set_mesh / `with mesh:`). Single-device
    # jits — even on multi-device processes — take the plain kernel.
    if _mesh_devices() > 1:
        return gn_stats_p(x, interpret)
    return gn_stats(x, interpret)


# ---------------------------------------------------------------------------
# Backward-pass grad stats: (sum_hw g, sum_hw g*x).
#
# The GroupNorm affine application y = x*a + bb (models/blocks._gn_apply)
# needs da = sum_hw(g*x) and dbb = sum_hw(g) in its backward — per-channel
# reduces over the SAME batch-in-sublanes conv layouts whose forward stats
# this file's kernel already streams. Left to XLA these lower to the
# lane-hostile "AllBatchInSubla" multiply_reduce fusions (~16 ms/step of
# the crop-512 train graph, plus the layout copies they force — round-3
# profile, BENCH_NOTES). Same streaming structure, two inputs.
# ---------------------------------------------------------------------------


def _grad_kernel(g_ref, x_ref, s_ref, p_ref):
    i = pl.program_id(0)
    r, w, b, cf = g_ref.shape
    g = g_ref[...].astype(jnp.float32).reshape(r * w, b, cf)
    x = x_ref[...].astype(jnp.float32).reshape(r * w, b, cf)
    s = jnp.sum(g, axis=0)
    p = jnp.sum(g * x, axis=0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = s
        p_ref[...] = p

    @pl.when(i != 0)
    def _acc():
        s_ref[...] += s
        p_ref[...] += p


def gn_grad_stats(g, x, interpret: bool = False):
    """(B, H, W, CF) cotangent + activation -> fp32 (sum_hw g, sum_hw g*x).

    Each grid step streams one row-block of BOTH tensors, so the VMEM
    budget per step is twice gn_stats' — halve the row tile."""
    b, h, w, cf = g.shape
    r = _tile_rows(h, w * b, cf, TILE_ELEM_LIMIT // 2)
    gt = jnp.transpose(g, (1, 2, 0, 3))  # layout bitcasts, as in gn_stats
    xt = jnp.transpose(x, (1, 2, 0, 3))
    s, p = pl.pallas_call(
        _grad_kernel,
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w, b, cf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cf), jnp.float32),
            jax.ShapeDtypeStruct((b, cf), jnp.float32),
        ],
        interpret=interpret,
    )(gt, xt)
    return s, p


@functools.partial(custom_partitioning, static_argnums=(2,))
def gn_grad_stats_p(g, x, interpret: bool = False):
    """gn_grad_stats with the same SPMD partition rule as gn_stats_p: b/c
    pass through, h/w are reduction factors (psum only when the mesh
    shards the spatial dims). Keeps the backward kernel sharded instead
    of replicated under pjit on >1-device meshes."""
    return gn_grad_stats(g, x, interpret)


_grad_infer_sharding, _grad_partition = _stats_rules(gn_grad_stats)

gn_grad_stats_p.def_partition(
    _grad_partition,
    infer_sharding_from_operands=_grad_infer_sharding,
    sharding_rule="b h w c, b h w c -> b c, b c",
    reduction_factors=("h", "w"),
)


def gn_grad_stats_dispatch(g, x, interpret: bool = False):
    # same active-mesh gate as _dispatch
    if _mesh_devices() > 1:
        return gn_grad_stats_p(g, x, interpret)
    return gn_grad_stats(g, x, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gn_stats_vjp(x, interpret: bool = False):
    """gn_stats with the closed-form backward (ds/dx = 1, dq/dx = 2x), so
    the plain-autodiff GN path (NOISEDIFF_GN_BWD=xla) can differentiate
    through the kernel. Under the default analytic _gn_coeffs custom_vjp
    the kernel only ever runs in the (non-differentiated) forward. When
    the trace has an active >1-device mesh the call routes through the
    SPMD-partitioned wrapper (gn_stats_p) so pjit shards rather than
    replicates."""
    return _dispatch(x, interpret)


def _fwd(x, interpret):
    return _dispatch(x, interpret), x


def _bwd(interpret, x, g):
    ds, dq = g  # fp32 (b, cf)
    dx = (
        ds[:, None, None, :]
        + 2.0 * x.astype(jnp.float32) * dq[:, None, None, :]
    ).astype(x.dtype)
    return (dx,)


gn_stats_vjp.defvjp(_fwd, _bwd)
